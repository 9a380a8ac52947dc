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
assigned_LPs 1-NN same-class            one fused masked argmin over original
  (binary_cuda_functions.cu:258-302)      coords (later index wins ties, as
                                          the CUDA `dist <= best` loop does)
get_clt_center running mean             segment mean of shifted coords
  (binary_cuda_functions.cu:217-246)

Cluster ids are ordered by (semantic class, batch item, first original point
index of the seed component) — the same order the reference produces by
looping classes then batch items then scanning seeds in index order
(/root/reference/network/PBNet.py:151, cluster.cu:57, binary.cu:161).

Exactness: a point's true neighbor window is [lb, ub) in the (group, l1)
order (|l1_i - l1_j| <= 2r for any neighbor pair, the same pruning bound the
reference's kernels use).  Each chunk's window starts at the chunk's first
row's lb; neighbors are missed only when a chunk's combined window exceeds
``band`` columns — counted in ``band_overflow``, never silent.

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
    static_argnames=("cluster_cap", "band", "chunk", "prop_iters"),
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
) -> ClusterResult:
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

    nchunks = (n + chunk - 1) // chunk
    npad = nchunks * chunk
    W = min(band, npad)

    # chunk window anchors: start at the first row's lower bound; a chunk's
    # combined true window is [lb[first], ub[last])
    lb_c = lb[jnp.arange(nchunks) * chunk]
    last_rows = jnp.minimum(jnp.arange(nchunks) * chunk + chunk - 1, n - 1)
    ub_c = ub[last_rows]
    # clamp anchor so the static window stays inside [0, npad)
    anchor = jnp.clip(lb_c, 0, jnp.maximum(npad - W, 0)).astype(jnp.int32)
    row_overflow = (ub_c - anchor) > W
    band_overflow = jnp.sum(
        jnp.where(row_overflow, jnp.minimum(chunk, n - jnp.arange(nchunks) * chunk), 0)
    ).astype(jnp.int32)

    def pad_to(x, fill):
        pad_width = [(0, npad - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, constant_values=fill)

    pos_p = pad_to(pos, 0.0)
    g_p = pad_to(g_s, INF_I32)
    valid_p = pad_to(valid_s, False)

    # batched window gathers: (nchunks, W) indices into the padded order
    w_idx = anchor[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]

    def win(arr):
        """(npad, ...) -> (nchunks, W, ...) banded window views."""
        return jnp.take(arr, w_idx, axis=0)

    # row-side tiles are plain reshapes (chunks tile the padded order)
    rx, ry, rz = (pos_p[:, a].reshape(nchunks, chunk) for a in range(3))
    rg = g_p.reshape(nchunks, chunk)
    rv = valid_p.reshape(nchunks, chunk)
    rows_idx = jnp.arange(npad, dtype=jnp.int32).reshape(nchunks, chunk)

    cp = win(pos_p)  # (nchunks, W, 3)
    cx, cy, cz = cp[:, :, 0], cp[:, :, 1], cp[:, :, 2]
    cg = win(g_p)
    cv = win(valid_p)
    cols_idx = w_idx

    def nbr_mask():
        """(nchunks, chunk, W) neighbor mask (excl. self).

        The squared distance is UNROLLED over x/y/z (no inner reduction) so
        the whole mask is a pure-elementwise producer of each consuming
        reduction — XLA fuses it into tiles; a `sum(d*d, -1)` inner reduce
        makes XLA materialize the (nchunks, chunk, W) tensor (2.4 GB here).
        """
        dx = rx[:, :, None] - cx[:, None, :]
        dy = ry[:, :, None] - cy[:, None, :]
        dz = rz[:, :, None] - cz[:, None, :]
        d2 = dx * dx + dy * dy + dz * dz
        return (
            (d2 <= r2)
            & (rg[:, :, None] == cg[:, None, :])
            & cv[:, None, :]
            & rv[:, :, None]
            & (rows_idx[:, :, None] != cols_idx[:, None, :])
        )

    # ---- pass 1: density ----
    density_s = jnp.sum(nbr_mask(), axis=2).reshape(npad)[:n].astype(jnp.int32)
    hp_s = (density_s >= min_pts) & valid_s
    hp_p = pad_to(hp_s, False)
    hp_w = win(hp_p)  # (nchunks, W), static across prop iterations
    hp_r = hp_p.reshape(nchunks, chunk)

    # ---- pass 2: min-label propagation over HP-HP edges ----
    init_label_p = pad_to(
        jnp.where(hp_s, jnp.arange(n, dtype=jnp.int32), INF_I32), INF_I32
    )

    def prop_once(label_p):
        m = nbr_mask() & hp_w[:, None, :]
        nbr_lab = jnp.where(m, win(label_p)[:, None, :], INF_I32)
        best = jnp.min(nbr_lab, axis=2)
        cur = label_p.reshape(nchunks, chunk)
        new = jnp.where(hp_r, jnp.minimum(cur, best), cur)
        return new.reshape(npad)

    def jump(label):
        tgt = jnp.clip(label, 0, n - 1)
        hop = jnp.where(label < n, label[tgt], label)
        return jnp.minimum(label, hop)

    def prop_body(_, label_p):
        return jump(jump(prop_once(label_p)))

    label_p = jax.lax.fori_loop(0, prop_iters, prop_body, init_label_p)
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
    # index among HP neighbors (last-BFS-wins, binary.cu:206-213) ----
    m = nbr_mask() & hp_w[:, None, :]
    nbr_first = jnp.where(m, win(first_p)[:, None, :], -1)
    best_first = jnp.max(nbr_first, axis=2)  # -1 if no HP neighbor
    amax = jnp.argmax(nbr_first, axis=2)  # (nchunks, chunk)
    best_root = jnp.take_along_axis(win(label_p), amax, axis=1)
    border_first = best_first.reshape(npad)[:n]
    border_root = best_root.reshape(npad)[:n]
    is_border = (~hp_s) & valid_s & (border_first >= 0)
    root_all = jnp.where(hp_s, label_s, jnp.where(is_border, border_root, INF_I32))

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

    # ---- assign remaining LPs / demoted points: 1-NN on ORIGINAL coords
    # among assigned points of the same group (binary_cuda_functions.cu:258) ----
    orig_s = orig[perm]
    assigned = cid_filtered >= 0
    if nv_flag:
        need = (~assigned) & valid_s
        # compact the points needing assignment into a static quarter-size
        # row block: with trained offsets the unassigned fraction is small.
        # Overflow is left unassigned (conservative) — detectable via sizes.
        noise_cap = min(max(256, npad // 4), n)
        need_key = jnp.where(need, 0, 1).astype(jnp.int32)
        srt_key, noise_rows = jax.lax.sort(
            (need_key, jnp.arange(n, dtype=jnp.int32)), num_keys=1
        )
        noise_rows = noise_rows[:noise_cap]
        noise_live = srt_key[:noise_cap] == 0
        q_pos = orig_s[noise_rows]
        q_g = g_s[noise_rows]

        orig_p = pad_to(orig_s, 1e9)
        assigned_p = pad_to(assigned, False)
        cid_p = pad_to(cid_filtered, -1)

        # one fused masked argmin over ALL candidates; the reference's CUDA
        # loop uses `dist <= best` so the LATER index wins ties — realized
        # here by argmin over the reversed candidate axis.  Distances are
        # unrolled over x/y/z (see nbr_mask) so the (noise, npad) tensor is
        # never materialized (22 GB otherwise).
        cxr, cyr, czr = (orig_p[::-1, a] for a in range(3))
        dx = q_pos[:, None, 0] - cxr[None, :]
        dy = q_pos[:, None, 1] - cyr[None, :]
        dz = q_pos[:, None, 2] - czr[None, :]
        d2 = dx * dx + dy * dy + dz * dz
        mok = assigned_p[::-1][None, :] & (g_p[::-1][None, :] == q_g[:, None])
        d2m = jnp.where(mok, d2, jnp.inf)
        jrev = jnp.argmin(d2m, axis=1).astype(jnp.int32)
        j = npad - 1 - jrev
        found = jnp.take(assigned_p, j) & (jnp.take(g_p, j) == q_g)
        best_cid = jnp.where(found, cid_p[j], -1)

        scatter_rows = jnp.where(noise_live, noise_rows, n)
        cid_final_s = jnp.zeros((n + 1,), jnp.int32).at[: n].set(
            cid_filtered
        ).at[scatter_rows].set(jnp.where(noise_live, best_cid, -1))[:n]
    else:
        cid_final_s = cid_filtered

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
    )
