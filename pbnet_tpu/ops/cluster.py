"""Point-wise binarization + semantic-constrained clustering (TPU-native).

Replaces the reference's PB_lib CUDA clustering stack
(/root/reference/lib/PB_lib/src/pbnet/binary.cu, cluster.cu,
binary_cuda_functions.cu, wrapper /root/reference/lib/PB_lib/torch_io/
pbnet_ops.py:12-82) with a fully data-parallel, static-shape algorithm:

reference pipeline                      TPU-native equivalent
------------------------------------    ---------------------------------------
thrust sort by L1 norm (binary.cu:49)   lax.sort by (group, l1) pair
k_num_nbs shared-mem window scan        banded chunk scan (lax.scan) over the
  (binary_cuda_functions.cu:29-89)        sorted order; windows are CONTIGUOUS
                                          dynamic slices anchored at each
                                          chunk's true lower bound (TPU:
                                          slices stream at HBM bandwidth,
                                          random gathers do not)
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
assigned_LPs 1-NN same-class            masked chunked argmin over original
  (binary_cuda_functions.cu:258-302)      coords
get_clt_center running mean             segment mean of shifted coords
  (binary_cuda_functions.cu:217-246)

Cluster ids are ordered by (semantic class, batch item, first original point
index of the seed component) — the same order the reference produces by
looping classes then batch items then scanning seeds in index order
(/root/reference/network/PBNet.py:151, cluster.cu:57, binary.cu:161).

Exactness: a point's true neighbor window is [lb, ub) in the (group, l1)
order (|l1_i - l1_j| <= 2r for any neighbor pair, the same pruning bound the
reference's kernels use).  Each chunk's slice starts at the chunk's first
row's lb; neighbors are missed only when a chunk's combined window exceeds
``band`` columns — counted in ``band_overflow``, never silent.

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


def _search_group_l1(g_s, l1_s, qg, ql1, side):
    """Vectorized binary search for (group, l1) pairs in the sorted order."""
    n = g_s.shape[0]
    iters = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        mid_c = jnp.minimum(mid, n - 1)
        mg, ml = g_s[mid_c], l1_s[mid_c]
        if side == "left":
            less = (mg < qg) | ((mg == qg) & (ml < ql1))
        else:
            less = (mg < qg) | ((mg == qg) & (ml <= ql1))
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

    lo, _ = jax.lax.fori_loop(
        0, iters, body,
        (jnp.zeros(qg.shape, jnp.int32), jnp.full(qg.shape, n, jnp.int32)),
    )
    return lo


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
    chunk: int = 256,
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

    # exact per-row window bounds in the sorted order
    lb = _search_group_l1(g_s, l1_s, g_s, l1_s - 2 * radius, "left")
    ub = _search_group_l1(g_s, l1_s, g_s, l1_s + 2 * radius, "right")

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

    def window(arr, c):
        """Contiguous W-wide column window for chunk c (dynamic slice)."""
        return jax.lax.dynamic_slice_in_dim(arr, anchor[c], W, axis=0)

    def rows_of(arr, c):
        return jax.lax.dynamic_slice_in_dim(arr, c * chunk, chunk, axis=0)

    def nbr_mask(c):
        """(chunk, W) neighbor mask for chunk c (excl. self)."""
        rp = rows_of(pos_p, c)
        rg = rows_of(g_p, c)
        rv = rows_of(valid_p, c)
        cp = window(pos_p, c)
        cg = window(g_p, c)
        cv = window(valid_p, c)
        d = rp[:, None, :] - cp[None, :, :]
        d2 = jnp.sum(d * d, axis=-1)
        rows_idx = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
        cols_idx = anchor[c] + jnp.arange(W, dtype=jnp.int32)
        m = (
            (d2 <= r2)
            & (rg[:, None] == cg[None, :])
            & cv[None, :]
            & rv[:, None]
            & (rows_idx[:, None] != cols_idx[None, :])
        )
        return m

    # ---- pass 1: density ----
    def density_body(_, c):
        m = nbr_mask(c)
        return None, jnp.sum(m, axis=1).astype(jnp.int32)

    _, dens_chunks = jax.lax.scan(
        density_body, None, jnp.arange(nchunks, dtype=jnp.int32)
    )
    density_s = dens_chunks.reshape(-1)[:n]
    hp_s = (density_s >= min_pts) & valid_s
    hp_p = pad_to(hp_s, False)

    # ---- pass 2: min-label propagation over HP-HP edges ----
    init_label_p = pad_to(
        jnp.where(hp_s, jnp.arange(n, dtype=jnp.int32), INF_I32), INF_I32
    )

    def prop_once(label_p):
        def body(_, c):
            m = nbr_mask(c) & window(hp_p, c)[None, :]
            nbr_lab = jnp.where(m, window(label_p, c)[None, :], INF_I32)
            best = jnp.min(nbr_lab, axis=1)
            cur = rows_of(label_p, c)
            new = jnp.where(rows_of(hp_p, c), jnp.minimum(cur, best), cur)
            return None, new

        _, lab_chunks = jax.lax.scan(
            body, None, jnp.arange(nchunks, dtype=jnp.int32)
        )
        return lab_chunks.reshape(-1)

    def jump(label):
        tgt = jnp.clip(label, 0, n - 1)
        hop = jnp.where(label < n, label[tgt], label)
        return jnp.minimum(label, hop)

    def prop_body(_, label_p):
        lab = prop_once(label_p)  # already npad long
        return jump(jump(lab))

    label_p = jax.lax.fori_loop(0, prop_iters, prop_body, init_label_p)
    label_s = label_p[:n]  # HP -> root (sorted index); LP/invalid -> INF

    # first ORIGINAL index per component (the reference's seed identity)
    root_seg = jnp.where(hp_s, label_s, n)
    comp_first_orig = jax.ops.segment_min(
        jnp.where(hp_s, perm, INF_I32), root_seg, num_segments=n + 1
    )

    # per-point "first original index of my component" (one gather, reused by
    # the border pass through contiguous windows)
    first_of_point = jnp.where(
        hp_s, comp_first_orig[jnp.clip(label_s, 0, n)], -1
    ).astype(jnp.int32)
    first_p = pad_to(first_of_point, -1)

    # ---- border LPs: adopt the component with the LARGEST first-original
    # index among HP neighbors (last-BFS-wins, binary.cu:206-213) ----
    def border_body(_, c):
        m = nbr_mask(c) & window(hp_p, c)[None, :]
        nbr_first = jnp.where(m, window(first_p, c)[None, :], -1)
        nbr_root = window(label_p, c)
        best_first = jnp.max(nbr_first, axis=1)  # -1 if no HP neighbor
        amax = jnp.argmax(nbr_first, axis=1)
        best_root = nbr_root[amax]
        return None, (best_first, best_root)

    _, (bf_chunks, br_chunks) = jax.lax.scan(
        border_body, None, jnp.arange(nchunks, dtype=jnp.int32)
    )
    border_first = bf_chunks.reshape(-1)[:n]
    border_root = br_chunks.reshape(-1)[:n]
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
        # row block: the full N x N scan dominated clustering latency, and
        # with trained offsets the unassigned fraction is small.  Overflow is
        # left unassigned (conservative) — detectable via cluster sizes.
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
        num_noise = jnp.sum(need.astype(jnp.int32))

        def nn_scan(_):
            def nn_body(carry, c):
                best_d, best_cid = carry
                cpos = rows_of(orig_p, c)  # candidate chunk (contiguous)
                cg = rows_of(g_p, c)
                cok = rows_of(assigned_p, c)
                ccid = rows_of(cid_p, c)
                d = q_pos[:, None, :] - cpos[None, :, :]
                d2 = jnp.sum(d * d, axis=-1)
                m = cok[None, :] & (cg[None, :] == q_g[:, None])
                d2 = jnp.where(m, d2, jnp.inf)
                j = jnp.argmin(d2, axis=1)
                dmin = jnp.take_along_axis(d2, j[:, None], 1)[:, 0]
                cbest = ccid[j]
                upd = dmin <= best_d  # <=: later candidate wins ties (ref)
                return (
                    jnp.where(upd, dmin, best_d),
                    jnp.where(upd, cbest, best_cid),
                ), None

            (_, best_cid), _ = jax.lax.scan(
                nn_body,
                (jnp.full((noise_cap,), jnp.inf),
                 jnp.full((noise_cap,), -1, jnp.int32)),
                jnp.arange(nchunks, dtype=jnp.int32),
            )
            return best_cid

        best_cid = jax.lax.cond(
            num_noise > 0, nn_scan,
            lambda _: jnp.full((noise_cap,), -1, jnp.int32), None,
        )
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
