"""Point-wise binarization + semantic-constrained clustering (TPU-native).

Replaces the reference's PB_lib CUDA clustering stack
(/root/reference/lib/PB_lib/src/pbnet/binary.cu, cluster.cu,
binary_cuda_functions.cu, wrapper /root/reference/lib/PB_lib/torch_io/
pbnet_ops.py:12-82) with a fully data-parallel, static-shape algorithm:

reference pipeline                      TPU-native equivalent
------------------------------------    ---------------------------------------
thrust sort by L1 norm (binary.cu:49)   lax.sort by (group, l1) pair
k_num_nbs shared-mem window scan        BATCHED banded windows: all (chunk, W)
  (binary_cuda_functions.cu:29-89)        tiles evaluated in one fused
                                          elementwise+reduce op (no serial
                                          scan; VPU tiles the whole tensor)
k_identify_HPs (min_pts)                density >= min_pts mask
host-loop BFS per seed (binary.cu:154)  min-label propagation + pointer
                                          jumping over HP-HP edges (equivalent
                                          connected components, log-depth)
border-point assignment (BFS visit,     LP within radius of >=1 HP adopts the
  last seed wins, binary.cu:206-213)      component with the LARGEST
                                          first-original-index root (=last
                                          BFS seed in the reference's order)
filter small clusters (binary.cu:219)   size < para_f*count_mean[sem] demoted,
                                          ids compacted order-preserving
assigned_LPs 1-NN same-class            banded-window 1-NN with a provable-
  (binary_cuda_functions.cu:258-302)      exactness check + compact exact
                                          fallback (later index wins ties, as
                                          the CUDA `dist <= best` loop does)
get_clt_center running mean             segment mean of shifted coords
  (binary_cuda_functions.cu:217-246)

Cluster ids are ordered by (semantic class, batch item, first original point
index of the seed component) — the same order the reference produces by
looping classes then batch items then scanning seeds in index order
(/root/reference/network/PBNet.py:151, cluster.cu:57, binary.cu:161).

Exactness: a point's true neighbor window is [lb, ub) in the (group, l1)
order (|l1_i - l1_j| <= 2r for any neighbor pair, the same pruning bound the
reference's kernels use).  Each chunk searches TWO ``band``-wide windows —
one anchored at its first row's lb, one ending at its last row's ub — so any
chunk whose combined span fits 2*band (e.g. a chunk straddling two large
instances whose predicted offsets collapse points onto the centers) is
covered exactly.  Rows whose own window still escapes the union are counted
per-row in ``band_overflow``, never silent.

Performance notes (measured on the axon TPU, round 2): `lax.sort` is ~free
amortized (<1 ms at 300k) while serial `lax.scan` steps and scalar gathers
are the expensive primitives.  Hence: window bounds come from a merge-sort
based searchsorted (2 sorts) instead of a binary search (18 serial gather
rounds), and every banded pass evaluates all (nchunks, chunk, W) tiles in one
fused op instead of scanning chunks.

Semantics notes (verified against the CUDA source):
* density excludes the point itself (k_num_nbs `ans - 1`); the python wrapper
  returns density+1 (pbnet_ops.py:75) — we expose both conventions.
* Only HPs relay connectivity; LPs within radius of an HP join that HP's
  component (classic DBSCAN border points).
* The 1-NN fallback search runs on ORIGINAL (unshifted) coordinates.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import pallas_kernels as pk

INF_I32 = np.int32(2**31 - 1)


class ClusterResult(NamedTuple):
    cluster_id: jnp.ndarray  # (N,) int32, -1 = unassigned
    num_clusters: jnp.ndarray  # () int32
    density: jnp.ndarray  # (N,) int32, neighbor count excluding self
    centers: jnp.ndarray  # (C, 3) f32 mean of shifted coords per cluster
    cluster_sem: jnp.ndarray  # (C,) int32
    cluster_batch: jnp.ndarray  # (C,) int32
    cluster_size: jnp.ndarray  # (C,) int32
    cluster_valid: jnp.ndarray  # (C,) bool
    band_overflow: jnp.ndarray  # () int32 rows whose true window exceeded band
    nn_overflow: jnp.ndarray = np.int32(0)  # () rows past the exact-1NN cap
    # () int32 label-propagation rounds run to fixpoint (diagnostic: trained
    # offsets with noisy blobs may need more rounds than oracle content —
    # PERF.md records the measured delta)
    prop_rounds: jnp.ndarray = np.int32(0)


def _group_l1_sort(shifted, group, valid):
    """Sort points by (group, l1norm); returns sorted arrays + permutation."""
    l1 = jnp.sum(jnp.abs(shifted), axis=1)
    g = jnp.where(valid, group, INF_I32)
    l1k = jnp.where(valid, l1, jnp.inf)
    n = shifted.shape[0]
    perm = jnp.arange(n, dtype=jnp.int32)
    g_s, l1_s, perm_s = jax.lax.sort((g, l1k, perm), num_keys=2, is_stable=True)
    return g_s, l1_s, perm_s


def _merge_searchsorted(g_s, l1_s, qg, ql1, side):
    """searchsorted on (group, l1) pairs via ONE merge sort.

    Returns, per query, the count of keys < query (side='left') or
    <= query (side='right').  Two ~free sorts replace the former 18-round
    binary search whose serial scalar gathers dominated latency.
    """
    n = g_s.shape[0]
    q = qg.shape[0]
    g_all = jnp.concatenate([g_s, qg])
    l_all = jnp.concatenate([l1_s, ql1])
    # tie-break tag: side='left' -> queries sort BEFORE equal keys
    key_tag = jnp.int32(1 if side == "left" else 0)
    q_tag = jnp.int32(1) - key_tag
    tags = jnp.concatenate([
        jnp.full((n,), key_tag), jnp.full((q,), q_tag)
    ])
    pay = jnp.concatenate([
        jnp.arange(n, dtype=jnp.int32),
        jnp.arange(q, dtype=jnp.int32) + n,
    ])
    _, _, _, ps2 = jax.lax.sort((g_all, l_all, tags, pay), num_keys=3)
    is_key = (ps2 < n).astype(jnp.int32)
    keys_before = jnp.cumsum(is_key) - is_key  # exclusive prefix count
    # restore query order (payload n..n+q-1 identifies queries)
    _, res_q = jax.lax.sort((ps2, keys_before), num_keys=1)
    return res_q[n:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "cluster_cap", "band", "chunk", "prop_iters", "nv_flag",
        "nn_exact_cap", "profile_stop",
    ),
)
def binary_cluster(
    shifted: jnp.ndarray,  # (N, 3) f32 offset-shifted coords
    orig: jnp.ndarray,  # (N, 3) f32 original coords
    sem: jnp.ndarray,  # (N,) int32 semantic class
    batch: jnp.ndarray,  # (N,) int32 batch item
    valid: jnp.ndarray,  # (N,) bool
    radius: float,
    min_pts: int,
    count_mean: jnp.ndarray,  # (sem_num,) f32 per-class mean point counts
    para_f: float = 0.05,
    nv_flag: bool = True,
    cluster_cap: int = 384,
    band: int = 4096,
    chunk: int = 1024,
    prop_iters: int = 10,
    nn_exact_cap: int | None = None,
    profile_stop: str | None = None,
) -> ClusterResult:
    # Non-differentiable by contract: the reference cluster op declares
    # backward=None (/root/reference/lib/PB_lib/torch_io/pbnet_ops.py:82) and
    # detaches its inputs (/root/reference/network/PBNet.py:176).  Cutting the
    # autodiff graph HERE (not at call sites) guarantees value_and_grad never
    # tries to linearize the Pallas kernels below, which have no JVP rule.
    shifted = jax.lax.stop_gradient(shifted)
    orig = jax.lax.stop_gradient(orig)
    count_mean = jax.lax.stop_gradient(count_mean)
    n = shifted.shape[0]
    # group encodes (sem, batch) so cluster ordering matches the reference's
    # class-outer / batch-inner loop (/root/reference/network/PBNet.py:151,
    # cluster.cu:57). batch < 64.
    group = sem * 64 + batch
    g_s, l1_s, perm = _group_l1_sort(shifted, group, valid)
    pos = shifted[perm]  # sorted shifted coords
    valid_s = valid[perm]
    r2 = jnp.float32(radius * radius)

    # exact per-row window bounds in the sorted order (merge searchsorted)
    lb = _merge_searchsorted(g_s, l1_s, g_s, l1_s - 2 * radius, "left")
    ub = _merge_searchsorted(g_s, l1_s, g_s, l1_s + 2 * radius, "right")

    # the neighbor mask is bit-packed into uint32 words, so both the band
    # width W and npad (its cap) must be 32-multiples — which holds only if
    # chunk is one (npad = nchunks * chunk)
    assert chunk % 32 == 0, f"chunk must be a multiple of 32, got {chunk}"
    nchunks = (n + chunk - 1) // chunk
    npad = nchunks * chunk
    W = min(((min(band, npad) + 31) // 32) * 32, npad)

    # chunk window anchors: start at the first row's lower bound; a chunk's
    # combined true window is [lb[first], ub[last])
    lb_c = lb[jnp.arange(nchunks) * chunk]
    last_rows = jnp.minimum(jnp.arange(nchunks) * chunk + chunk - 1, n - 1)
    ub_c = ub[last_rows]
    # DUAL windows per chunk: a left window anchored at the first row's lower
    # bound and a right window ending at the last row's upper bound.  A chunk
    # whose combined span fits one band uses only the left window (the right
    # collapses onto it and its fresh-column mask goes empty); a chunk
    # straddling a group boundary (span up to 2W — e.g. two large instances
    # whose points collapse onto their centers) is covered EXACTLY by the
    # union.  Only spans beyond 2W can still drop neighbor pairs, and those
    # rows are counted per-row in band_overflow, never silently.
    hi = jnp.maximum(npad - W, 0)
    # anchors are 32-ALIGNED so every window is a run of whole 32-point
    # blocks: win() then gathers (W/32) block rows instead of W scalar rows
    # (~30x fewer gather ops; gathers are op-count-bound).  Aligning the
    # left anchor DOWN keeps lb >= anchor; the right anchor aligns UP, which
    # keeps ub <= anchor2 + W (hi and npad are 32-multiples since chunk is);
    # the per-row coverage accounting below uses the aligned values, so the
    # band_overflow guarantee is unchanged.
    anchor = ((jnp.clip(lb_c, 0, hi) // 32) * 32).astype(jnp.int32)
    anchor2 = jnp.clip(
        ((ub_c - W + 31) // 32) * 32, anchor, hi
    ).astype(jnp.int32)
    # per-row honest accounting: a VALID row is flagged iff its own true
    # window [lb, ub) escapes the union of its chunk's two bands (invalid
    # rows share one giant INF group whose windows are meaningless — they
    # cluster nothing and must not count)
    a1r = jnp.repeat(anchor, chunk, total_repeat_length=npad)[:n]
    a2r = jnp.repeat(anchor2, chunk, total_repeat_length=npad)[:n]
    contiguous = a2r <= a1r + W
    row_covered = (
        (contiguous & (lb >= a1r) & (ub <= a2r + W))
        | ((lb >= a1r) & (ub <= a1r + W))
        | ((lb >= a2r) & (ub <= a2r + W))
    )
    band_overflow = jnp.sum(
        (valid_s & ~row_covered).astype(jnp.int32)
    ).astype(jnp.int32)

    def pad_to(x, fill):
        pad_width = [(0, npad - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, constant_values=fill)


    def _partial(digest):
        """Latency-attribution early exit (profile_stop): a zeroed result
        whose cluster_id carries the phase's live tensor so a timing digest
        cannot dead-code-eliminate the phase."""
        z = jnp.zeros((cluster_cap,), jnp.int32)
        return ClusterResult(
            cluster_id=jnp.ravel(digest.astype(jnp.int32))[:n],
            num_clusters=jnp.int32(0), density=jnp.zeros((n,), jnp.int32),
            centers=jnp.zeros((cluster_cap, 3), jnp.float32),
            cluster_sem=z, cluster_batch=z, cluster_size=z,
            cluster_valid=z > 0, band_overflow=band_overflow,
            nn_overflow=jnp.int32(0),
        )

    pos_p = pad_to(pos, 0.0)
    g_p = pad_to(g_s, INF_I32)
    valid_p = pad_to(valid_s, False)

    # batched window gathers: (nchunks, W) indices into the padded order
    w_idx = anchor[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    w_idx2 = anchor2[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    # the right window contributes only columns NOT already in the left one
    fresh2 = w_idx2 >= anchor[:, None] + W  # (nchunks, W)

    def _win_blocks(arr, anc):
        """Window gather as 32-point BLOCK rows (anchors are 32-aligned):
        reshaping (npad, C) to (npad/32, 32*C) makes each window a run of
        W/32 consecutive block rows — one ~32*C-lane gather fetches 32
        points at the fixed per-op cost scalar-row gathers pay per point."""
        c = 1 if arr.ndim == 1 else arr.shape[1]
        blk = arr.reshape(npad // 32, 32 * c)
        bidx = (anc // 32)[:, None] + jnp.arange(W // 32, dtype=jnp.int32)
        g = jnp.take(blk, bidx, axis=0)  # (nchunks, W/32, 32*c)
        out = g.reshape(nchunks, W, c)
        return out[:, :, 0] if arr.ndim == 1 else out

    def win(arr):
        """(npad, ...) -> (nchunks, W, ...) banded window views (left)."""
        return _win_blocks(arr, anchor)

    def win2(arr):
        """Right-anchored window views; pair with the fresh2 column mask."""
        return _win_blocks(arr, anchor2)

    # row-side tiles are plain reshapes (chunks tile the padded order)
    rx, ry, rz = (pos_p[:, a].reshape(nchunks, chunk) for a in range(3))
    rg = g_p.reshape(nchunks, chunk)
    rv = valid_p.reshape(nchunks, chunk)
    rows_idx = jnp.arange(npad, dtype=jnp.int32).reshape(nchunks, chunk)

    def side(which):
        """Column-side tensors for window 1 (left) or 2 (right)."""
        w, idx, extra = (win, w_idx, None) if which == 1 else (
            win2, w_idx2, fresh2)
        cp = w(pos_p)  # (nchunks, W, 3)
        cvm = w(valid_p)
        if extra is not None:
            cvm = cvm & extra
        return (cp[:, :, 0], cp[:, :, 1], cp[:, :, 2], w(g_p), cvm, idx)

    sides = (side(1), side(2))

    def nbr_mask(s):
        """(nchunks, chunk, W) neighbor mask (excl. self) for one window.

        The squared distance is UNROLLED over x/y/z (no inner reduction) so
        the whole mask is a pure-elementwise producer of each consuming
        reduction — XLA fuses it into tiles; a `sum(d*d, -1)` inner reduce
        makes XLA materialize the (nchunks, chunk, W) tensor (2.4 GB here).
        """
        cx, cy, cz, cg_, cv_, cidx = s
        dx = rx[:, :, None] - cx[:, None, :]
        dy = ry[:, :, None] - cy[:, None, :]
        dz = rz[:, :, None] - cz[:, None, :]
        d2 = dx * dx + dy * dy + dz * dz
        return (
            (d2 <= r2)
            & (rg[:, :, None] == cg_[:, None, :])
            & cv_[:, None, :]
            & rv[:, :, None]
            & (rows_idx[:, :, None] != cidx[:, None, :])
        )

    # ---- pass 1: density + packed neighbor bitmask ----
    # The (nchunks, chunk, W) neighbor mask is the expensive banded tensor
    # (~14 VPU ops per position to rebuild).  Pack it into uint32 bit-words
    # ONCE; density is its popcount, and every later pass (label-propagation
    # rounds, border adoption) consumes 32 neighbors per word with shift+and
    # (~4 ops per position) instead of recomputing distances.
    NW = W // 32
    bitpos = jnp.arange(32, dtype=jnp.uint32)

    def pack_w(mask):
        """(..., W) bool -> (..., W//32) uint32 bit-words (bit b of word w
        = window position w*32 + b)."""
        m = mask.reshape(mask.shape[:-1] + (NW, 32))
        return jnp.sum(m.astype(jnp.uint32) << bitpos, axis=-1, dtype=jnp.uint32)

    def lane(x):
        """(nchunks, W) -> (nchunks, 32, NW) bit-lane-major window planes."""
        return x.reshape(nchunks, NW, 32).swapaxes(1, 2)

    # Packed per-point row table for window-plane builds: gathers are
    # op-count-bound (~fixed cost up to a 128-lane row), so fetching
    # [x|y|z|g|valid] in ONE 5-lane row gather per (chunk, window) replaces
    # five separate (nchunks, W) gathers.  The table is INT32 with the f32
    # coords riding as bitcasts: int bit patterns survive any data path,
    # whereas int payloads bitcast to f32 do NOT on TPU (INF_I32 is a NaN
    # the hardware canonicalizes; 0/1 are denormals it flushes — measured:
    # zero clusters end to end).
    f2i = functools.partial(jax.lax.bitcast_convert_type,
                            new_dtype=jnp.int32)
    i2f = functools.partial(jax.lax.bitcast_convert_type,
                            new_dtype=jnp.float32)
    ptable = jnp.stack([
        f2i(pos_p[:, 0]), f2i(pos_p[:, 1]), f2i(pos_p[:, 2]),
        g_p, valid_p.astype(jnp.int32),
    ], axis=1)  # (npad, 5) int32

    def wplanes_packed(which):
        """Bit-lane-major window planes via one row gather of ptable."""
        w, idx, extra = (win, w_idx, None) if which == 1 else (
            win2, w_idx2, fresh2)
        g5 = w(ptable)  # (nchunks, W, 5) — ONE gather
        cv_ = g5[:, :, 4] > 0
        if extra is not None:
            cv_ = cv_ & extra
        wf = jnp.stack(
            [lane(i2f(g5[:, :, 0])), lane(i2f(g5[:, :, 1])),
             lane(i2f(g5[:, :, 2]))], 1)
        wi = jnp.stack([
            lane(g5[:, :, 3]),
            lane(cv_.astype(jnp.int32)),
            lane(idx),  # window source indices: computed, not gathered
        ], 1)
        return wf, wi

    if pk.use_pallas():
        # one fused Pallas pass: distances + masks + pack + density, all
        # in VMEM (the XLA path below writes/reads the mask via the packed
        # reduction 32 bit-positions at a time)
        rows_f = jnp.stack([rx, ry, rz], axis=1)
        rows_i = jnp.stack([rg, rv.astype(jnp.int32), rows_idx], axis=1)

        w1f, w1i = wplanes_packed(1)
        w2f, w2i = wplanes_packed(2)
        b1, b2, dens = pk.neighbor_pack(
            r2, rows_f, rows_i, w1f, w1i, w2f, w2i)
        bits = (b1, b2)
        density_s = dens.reshape(npad)[:n]
    else:
        bits = tuple(pack_w(nbr_mask(s)) for s in sides)  # 2 x (nc, chunk, NW)
        density_s = (
            jnp.sum(jax.lax.population_count(bits[0]), axis=2)
            + jnp.sum(jax.lax.population_count(bits[1]), axis=2)
        ).reshape(npad)[:n].astype(jnp.int32)
    if profile_stop == "pack":
        return _partial(jnp.pad(density_s, (0, npad - n)))
    hp_s = (density_s >= min_pts) & valid_s
    hp_p = pad_to(hp_s, False)
    # HP-filtered bits: propagation and border passes only look at HP
    # neighbors, so fold the filter into the stored words
    bits_hp = tuple(
        b & pack_w(w(hp_p))[:, None, :]
        for b, w in zip(bits, (win, win2))
    )
    hp_r = hp_p.reshape(nchunks, chunk)

    # ---- pass 2: min-label propagation over HP-HP edges ----
    # Same-cell pre-merge: quantize shifted coords at g = r/sqrt(3); any two
    # points of one (group, cell) sit within the cell diagonal g*sqrt(3) = r,
    # so same-cell HPs are provably direct neighbors and can be union'd with
    # one sort + segment-min BEFORE the banded passes.  Offset-shifted scenes
    # collapse whole instances into a few cells, so this merges exactly the
    # blobs that otherwise force extra propagation rounds (each round costs a
    # full (nchunks, chunk, W) neighbor evaluation).
    inv_g = jnp.float32(np.sqrt(3.0) / radius)
    cell = jnp.floor(pos * inv_g).astype(jnp.int32)
    ck = (
        jnp.where(valid_s & hp_s, g_s, INF_I32),
        cell[:, 0], cell[:, 1], cell[:, 2],
    )
    sidx = jnp.arange(n, dtype=jnp.int32)
    k0, k1, k2, k3, cperm = jax.lax.sort(ck + (sidx,), num_keys=4)
    bnd = (
        (k0 != jnp.roll(k0, 1)) | (k1 != jnp.roll(k1, 1))
        | (k2 != jnp.roll(k2, 1)) | (k3 != jnp.roll(k3, 1))
    ).at[0].set(True)
    cseg = jnp.cumsum(bnd.astype(jnp.int32)) - 1  # (n,) cell rank, < n
    init_raw = jnp.where(hp_s, sidx, INF_I32)
    cell_min = jax.ops.segment_min(
        init_raw[cperm], cseg, num_segments=n
    )
    premerged = jnp.full((n,), INF_I32, jnp.int32).at[cperm].set(
        cell_min[cseg]
    )
    init_label_p = pad_to(
        jnp.where(hp_s, premerged, INF_I32), INF_I32
    )

    def bits_reduce(values_p, bhp_words, reducer, init):
        """Reduce ``values_p`` over each row's set neighbor bits.

        values_p: (npad,) per-point values; returns (nchunks, chunk) of
        ``reducer`` over {values[j] : bit j set} starting from ``init``.

        On TPU this is one Pallas pass that reads each bit-word once
        (pallas_kernels.masked_window_reduce); the XLA fallback below
        re-reads the word tensor per bit position (32x the HBM traffic).
        """
        if pk.use_pallas():
            return pk.masked_window_reduce(
                bhp_words[0], bhp_words[1], win(values_p), win2(values_p),
                minimize=reducer is jnp.minimum,
            )
        red = jnp.min if reducer is jnp.minimum else jnp.max
        best = jnp.full((nchunks, chunk), init, values_p.dtype)
        for bw, w in zip(bhp_words, (win, win2)):
            vw = w(values_p).reshape(nchunks, NW, 32)
            for b in range(32):
                m = (bw >> jnp.uint32(b)) & jnp.uint32(1)  # (nc, chunk, NW)
                cand = jnp.where(m > 0, vw[:, None, :, b], init)
                best = reducer(best, red(cand, axis=2))
        return best

    def prop_once(label_p):
        best = bits_reduce(label_p, bits_hp, jnp.minimum, INF_I32)
        cur = label_p.reshape(nchunks, chunk)
        new = jnp.where(hp_r, jnp.minimum(cur, best), cur)
        return new.reshape(npad)

    def jump(label):
        tgt = jnp.clip(label, 0, n - 1)
        hop = jnp.where(label < n, label[tgt], label)
        return jnp.minimum(label, hop)

    def prop_cond(state):
        it, changed, _ = state
        return (it < prop_iters) & changed

    def prop_body(state):
        it, _, label_p = state
        # one neighbor-min pass (the expensive banded tile op), then four
        # pointer-jump hops (cheap (N,) gathers) for aggressive path
        # compression — fewer banded passes to convergence
        new = prop_once(label_p)
        for _ in range(4):
            new = jump(new)
        return it + 1, jnp.any(new != label_p), new

    # bounded while: early-exit at fixpoint (each iteration re-evaluates the
    # banded neighbor mask, the dominant cost; most scenes converge in a few
    # rounds thanks to the two pointer-jump hops per round)
    prop_rounds, _, label_p = jax.lax.while_loop(
        prop_cond, prop_body, (jnp.int32(0), jnp.bool_(True), init_label_p)
    )
    if profile_stop == "prop":
        return _partial(label_p)
    label_s = label_p[:n]  # HP -> root (sorted index); LP/invalid -> INF

    # first ORIGINAL index per component (the reference's seed identity)
    root_seg = jnp.where(hp_s, label_s, n)
    comp_first_orig = jax.ops.segment_min(
        jnp.where(hp_s, perm, INF_I32), root_seg, num_segments=n + 1
    )

    # per-point "first original index of my component"
    first_of_point = jnp.where(
        hp_s, comp_first_orig[jnp.clip(label_s, 0, n)], -1
    ).astype(jnp.int32)
    first_p = pad_to(first_of_point, -1)

    # ---- border LPs: adopt the component with the LARGEST first-original
    # index among HP neighbors (last-BFS-wins, binary.cu:206-213).
    # Two packed-bit passes: max of first-orig over set bits, then any root
    # whose first-orig equals that max (equal first-orig => identical
    # component, so any matching root is THE root). ----
    if pk.use_pallas():
        # fused single pass over the bit words: max first-orig + its root;
        # (first, label) windows fetched as ONE 2-lane row gather per window
        fl = jnp.stack([first_p, label_p], axis=1)  # (npad, 2) int32
        flw1, flw2 = win(fl), win2(fl)
        best_first, root_pick = pk.masked_window_border(
            bits_hp[0], bits_hp[1], flw1[:, :, 0], flw2[:, :, 0],
            flw1[:, :, 1], flw2[:, :, 1],
        )
    else:
        best_first = bits_reduce(first_p, bits_hp, jnp.maximum, jnp.int32(-1))
        root_pick = jnp.full((nchunks, chunk), -1, jnp.int32)
        for bw, w in zip(bits_hp, (win, win2)):
            fw = w(first_p).reshape(nchunks, NW, 32)
            lw = w(label_p).reshape(nchunks, NW, 32)
            for b in range(32):
                m = (bw >> jnp.uint32(b)) & jnp.uint32(1)
                hit = (m > 0) & (fw[:, None, :, b] == best_first[:, :, None])
                cand = jnp.where(hit, lw[:, None, :, b], -1)
                root_pick = jnp.maximum(root_pick, jnp.max(cand, axis=2))
    border_first = best_first.reshape(npad)[:n]
    border_root = root_pick.reshape(npad)[:n]
    is_border = (~hp_s) & valid_s & (border_first >= 0)
    root_all = jnp.where(hp_s, label_s, jnp.where(is_border, border_root, INF_I32))
    if profile_stop == "border":
        return _partial(jnp.pad(root_all, (0, npad - n)))

    # ---- enumerate + order clusters by (group, first_orig) ----
    has_comp = comp_first_orig[:n] != INF_I32  # indexed by root
    comp_group = jax.ops.segment_min(
        jnp.where(hp_s, g_s, INF_I32), root_seg, num_segments=n + 1
    )[:n]
    order_g = jnp.where(has_comp, comp_group, INF_I32)
    order_f = jnp.where(has_comp, comp_first_orig[:n], INF_I32)
    root_index = jnp.arange(n, dtype=jnp.int32)
    og, of, oroot = jax.lax.sort((order_g, order_f, root_index), num_keys=2)
    ncomp = jnp.sum(has_comp.astype(jnp.int32))
    rank_of_root = jnp.zeros((n + 1,), jnp.int32).at[jnp.clip(oroot, 0, n)].set(
        jnp.arange(n, dtype=jnp.int32)
    )

    # ---- sizes (HP members + border LPs) ----
    cid_all = jnp.where(
        root_all < n, rank_of_root[jnp.clip(root_all, 0, n)], cluster_cap
    )
    cid_all = jnp.where(root_all == INF_I32, cluster_cap, cid_all)
    cid_all = jnp.minimum(cid_all, cluster_cap)
    size = jax.ops.segment_sum(
        (cid_all < cluster_cap).astype(jnp.int32), cid_all,
        num_segments=cluster_cap + 1,
    )[:cluster_cap]

    c_idx = jnp.arange(cluster_cap, dtype=jnp.int32)
    cvalid0 = c_idx < jnp.minimum(ncomp, cluster_cap)
    csem0 = jnp.where(cvalid0, og[c_idx] // 64, -1)
    cbatch0 = jnp.where(cvalid0, og[c_idx] % 64, -1)

    # ---- filter small clusters (binary.cu:219-268) ----
    thresh = para_f * count_mean[jnp.clip(csem0, 0, count_mean.shape[0] - 1)]
    keep = cvalid0 & (size.astype(jnp.float32) >= thresh)
    new_id_of = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)) - 1, -1)
    num_clusters = jnp.sum(keep.astype(jnp.int32))
    cid_filtered = jnp.where(
        (cid_all < cluster_cap) & keep[jnp.clip(cid_all, 0, cluster_cap - 1)],
        new_id_of[jnp.clip(cid_all, 0, cluster_cap - 1)],
        -1,
    )

    if profile_stop == "order":
        return _partial(jnp.pad(cid_filtered, (0, npad - n)))
    # ---- assign remaining LPs / demoted points: 1-NN on ORIGINAL coords
    # among assigned points of the same group (binary_cuda_functions.cu:258) ----
    orig_s = orig[perm]
    assigned = cid_filtered >= 0
    if nv_flag:
        # Two-phase exact 1-NN (reference: brute-force O(noise*N),
        # binary_cuda_functions.cu:258-302):
        #   1. banded window pass over the SAME (nchunks, chunk, W) tiles as
        #      the density pass — candidates outside the window have
        #      |l1(p)-l1(q)| >= margin, hence d2 >= margin^2/3, so a window
        #      hit with best_d2 <= margin^2/3 is PROVABLY the global 1-NN;
        #   2. the few unproven rows go through a compacted exact pass
        #      (static cap; overflow rows keep the window answer, counted in
        #      nn_overflow).
        # Tie-break in both phases: the reference's `dist <= best` loop over
        # the l1-sorted order means the LATER sorted index wins — realized by
        # argmin over the reversed candidate axis.  (A tie between a window
        # candidate and an unexamined equal-distance candidate outside the
        # window could in principle pick the other point; measure zero on
        # real coordinates.)
        need = (~assigned) & valid_s
        # per-chunk needy-row counts: the Pallas 1-NN kernel skips chunks
        # with none (trained/oracle content routes only a few % of rows to
        # the fallback)
        need_c = jnp.sum(
            pad_to(need, False).reshape(nchunks, chunk).astype(jnp.int32),
            axis=1,
        )
        orig_p = pad_to(orig_s, 1e9)
        assigned_p = pad_to(assigned, False)
        cid_p = pad_to(cid_filtered, -1)
        l1_pd = pad_to(l1_s, np.inf)

        # candidate windows REVERSED along the window axis (cheap 2-D
        # reversals) so plain argmin returns the LAST forward-order minimum
        # — reversing the (nchunks, chunk, W) distance tensor instead would
        # materialize 2.4 GB.  Both dual windows are searched; the right
        # window's fresh columns hold strictly LATER sorted indices, so on a
        # cross-window tie the right window wins (dist <= best semantics).
        rx3 = (orig_p[:, 0].reshape(nchunks, chunk),
               orig_p[:, 1].reshape(nchunks, chunk),
               orig_p[:, 2].reshape(nchunks, chunk))

        def band_1nn(which):
            w, anc, fr = ((win, anchor, None) if which == 1
                          else (win2, anchor2, fresh2))
            if pk.use_pallas():
                rows_fq = jnp.stack(rx3, axis=1)
                rows_iq = jnp.stack([rg, rg, rg], axis=1)
                # [ox|oy|oz|g|assigned] in ONE 5-lane row gather per
                # window (fresh2 folds in afterwards: it is window-, not
                # point-indexed).  INT32 table, coords as bitcasts — int
                # payloads in f32 lanes get NaN-canonicalized/denormal-
                # flushed on TPU (see ptable above).
                og5 = jnp.stack([
                    f2i(orig_p[:, 0]), f2i(orig_p[:, 1]), f2i(orig_p[:, 2]),
                    g_p, assigned_p.astype(jnp.int32),
                ], axis=1)
                w5 = w(og5)  # (nchunks, W, 5) int32
                gw = w5[:, :, 3]
                cassw = w5[:, :, 4] > 0
                if fr is not None:
                    cassw = cassw & fr
                wfq = jnp.stack(
                    [lane(i2f(w5[:, :, a])) for a in range(3)], 1)
                wiq = jnp.stack(
                    [lane(gw), lane(cassw.astype(jnp.int32)), lane(gw)], 1)
                bd2, col = pk.window_1nn(rows_fq, rows_iq, wfq, wiq,
                                         need=need_c)
                return bd2, anc[:, None] + col
            cass = w(assigned_p)
            if fr is not None:
                cass = cass & fr
            cwx, cwy, cwz = (w(orig_p[:, a])[:, ::-1] for a in range(3))
            cass = cass[:, ::-1]
            cgr = w(g_p)[:, ::-1]
            dxw = rx3[0][:, :, None] - cwx[:, None, :]
            dyw = rx3[1][:, :, None] - cwy[:, None, :]
            dzw = rx3[2][:, :, None] - cwz[:, None, :]
            d2w = dxw * dxw + dyw * dyw + dzw * dzw
            mokw = cass[:, None, :] & (rg[:, :, None] == cgr[:, None, :])
            d2wm = jnp.where(mokw, d2w, jnp.inf)
            jrev = jnp.argmin(d2wm, axis=2).astype(jnp.int32)
            wj = (W - 1) - jrev
            bd2 = jnp.take_along_axis(d2wm, jrev[:, :, None], axis=2)[:, :, 0]
            return bd2, anc[:, None] + wj  # window col -> padded sorted row

        bd2_1, j1 = band_1nn(1)
        bd2_2, j2b = band_1nn(2)
        take2 = bd2_2 <= bd2_1  # right fresh indices are later: ties -> right
        best_d2 = jnp.where(take2, bd2_2, bd2_1)
        j_band = jnp.where(take2, j2b, j1)
        found_band = jnp.isfinite(best_d2)
        cid_band = jnp.where(
            found_band, jnp.take(cid_p, jnp.clip(j_band, 0, npad - 1)), -1
        ).reshape(npad)[:n]
        found_band_f = found_band.reshape(npad)[:n]
        best_d2_f = best_d2.reshape(npad)[:n]

        # provable-exactness margin (l1 distance to the union's edges; inf
        # when flush with the array ends).  Cross-group edges only shrink the
        # margin (conservative).  Non-contiguous unions (span > 2W) prove
        # nothing — margin 0 routes those rows to the exact fallback.
        l1_lo = jnp.take(l1_pd, anchor)  # (nchunks,)
        l1_hi = jnp.take(l1_pd, jnp.minimum(anchor2 + W - 1, npad - 1))
        l1_row = l1_pd.reshape(nchunks, chunk)
        m_lo = jnp.where(anchor[:, None] > 0, l1_row - l1_lo[:, None], np.inf)
        m_hi = jnp.where(
            (anchor2 + W)[:, None] < npad, l1_hi[:, None] - l1_row, np.inf
        )
        contig_c = (anchor2 <= anchor + W)[:, None]
        margin = jnp.where(
            contig_c, jnp.maximum(jnp.minimum(m_lo, m_hi), 0.0), 0.0
        )
        proven = (found_band & (best_d2 <= margin * margin / 3.0)).reshape(
            npad
        )[:n]

        # ---- exact fallback for unproven rows (compacted, static cap;
        # the pass costs F * npad distance checks, so the cap is a shapes
        # knob — rows past it keep the window answer and are counted) ----
        F = min(nn_exact_cap or max(256, npad // 32), n)
        need_f = need & ~proven
        order_key = jnp.where(need_f, 0, 1).astype(jnp.int32)
        srt_key, f_rows = jax.lax.sort(
            (order_key, jnp.arange(n, dtype=jnp.int32)), num_keys=1
        )
        f_rows = f_rows[:F]
        f_live = srt_key[:F] == 0
        nn_overflow = jnp.maximum(
            jnp.sum(need_f.astype(jnp.int32)) - F, 0
        ).astype(jnp.int32)
        q_pos = orig_s[f_rows]
        q_g = g_s[f_rows]
        cxr, cyr, czr = (orig_p[::-1, a] for a in range(3))
        dx = q_pos[:, None, 0] - cxr[None, :]
        dy = q_pos[:, None, 1] - cyr[None, :]
        dz = q_pos[:, None, 2] - czr[None, :]
        d2 = dx * dx + dy * dy + dz * dz
        mok = assigned_p[::-1][None, :] & (g_p[::-1][None, :] == q_g[:, None])
        d2m = jnp.where(mok, d2, jnp.inf)
        jr2 = jnp.argmin(d2m, axis=1).astype(jnp.int32)
        j2 = npad - 1 - jr2
        found2 = jnp.take(assigned_p, j2) & (jnp.take(g_p, j2) == q_g)
        cid_exact = jnp.where(found2, cid_p[j2], -1)

        # combine: band answer where needed, overwritten by the exact pass
        cid_final_s = jnp.where(
            need & found_band_f, cid_band, cid_filtered
        )
        scatter_rows = jnp.where(f_live, f_rows, n)
        cid_final_s = jnp.concatenate(
            [cid_final_s, jnp.full((1,), -1, jnp.int32)]
        ).at[scatter_rows].set(
            jnp.where(f_live, cid_exact, -1)
        )[:n]
    else:
        cid_final_s = cid_filtered
        nn_overflow = jnp.int32(0)

    # ---- per-cluster mean of shifted coords (binary_cuda_functions.cu:217) ----
    seg = jnp.where(cid_final_s >= 0, cid_final_s, cluster_cap)
    csum = jax.ops.segment_sum(
        jnp.where((cid_final_s >= 0)[:, None], pos, 0.0), seg,
        num_segments=cluster_cap + 1,
    )[:cluster_cap]
    ccnt = jax.ops.segment_sum(
        (cid_final_s >= 0).astype(jnp.float32), seg, num_segments=cluster_cap + 1
    )[:cluster_cap]
    centers = csum / jnp.maximum(ccnt, 1.0)[:, None]

    # final per-cluster metadata in filtered id space
    fvalid = c_idx < num_clusters
    inv = jnp.full((cluster_cap + 1,), -1, jnp.int32).at[
        jnp.where(keep, new_id_of, cluster_cap)
    ].set(c_idx)
    old_of_new = inv[:cluster_cap]  # new id -> pre-filter id
    fsem = jnp.where(fvalid, csem0[jnp.clip(old_of_new, 0, cluster_cap - 1)], -1)
    fbatch = jnp.where(fvalid, cbatch0[jnp.clip(old_of_new, 0, cluster_cap - 1)], -1)
    fsize = jax.ops.segment_sum(
        (cid_final_s >= 0).astype(jnp.int32), seg, num_segments=cluster_cap + 1
    )[:cluster_cap]

    # ---- un-sort back to original point order ----
    cluster_id = jnp.full((n,), -1, jnp.int32).at[perm].set(cid_final_s)
    density = jnp.zeros((n,), jnp.int32).at[perm].set(density_s)

    return ClusterResult(
        cluster_id=cluster_id,
        num_clusters=num_clusters,
        density=density,
        centers=centers,
        cluster_sem=fsem,
        cluster_batch=fbatch,
        cluster_size=fsize,
        cluster_valid=fvalid,
        band_overflow=band_overflow,
        nn_overflow=nn_overflow,
        prop_rounds=prop_rounds,
    )
