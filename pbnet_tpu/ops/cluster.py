"""Point-wise binarization + semantic-constrained clustering (TPU-native).

Replaces the reference's PB_lib CUDA clustering stack
(/root/reference/lib/PB_lib/src/pbnet/binary.cu, cluster.cu,
binary_cuda_functions.cu, wrapper /root/reference/lib/PB_lib/torch_io/
pbnet_ops.py:12-82) with a fully data-parallel, static-shape algorithm:

reference pipeline                      TPU-native equivalent
------------------------------------    ---------------------------------------
thrust sort by L1 norm (binary.cu:49)   lax.sort by (group, l1) pair
k_num_nbs shared-mem window scan        banded chunk scan (lax.scan) over the
  (binary_cuda_functions.cu:29-89)        sorted order, VPU distance tiles
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
    band_overflow: jnp.ndarray  # () int32 points whose true window exceeded band


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
    prop_iters: int = 12,
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

    # exact window bounds (for band-overflow diagnostics)
    lb = _search_group_l1(g_s, l1_s, g_s, l1_s - 2 * radius, "left")
    ub = _search_group_l1(g_s, l1_s, g_s, l1_s + 2 * radius, "right")

    nchunks = (n + chunk - 1) // chunk
    npad = nchunks * chunk
    half = band // 2

    def pad_to(x, fill):
        pad_width = [(0, npad - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, constant_values=fill)

    pos_p = pad_to(pos, 0.0)
    g_p = pad_to(g_s, INF_I32)
    valid_p = pad_to(valid_s, False)

    row_ids_all = jnp.arange(npad, dtype=jnp.int32)

    def window_cols(c):
        """Column index window for chunk c: [c*chunk - half, c*chunk + chunk + half)."""
        start = c * chunk - half
        idx = start + jnp.arange(chunk + band, dtype=jnp.int32)
        ok = (idx >= 0) & (idx < n)
        idx_c = jnp.clip(idx, 0, npad - 1)
        return idx_c, ok

    def nbr_mask(c, rows_pos, rows_g, rows_valid, rows_idx):
        idx_c, ok = window_cols(c)
        cpos = pos_p[idx_c]  # (W, 3)
        cg = g_p[idx_c]
        cvalid = valid_p[idx_c] & ok
        d = rows_pos[:, None, :] - cpos[None, :, :]
        d2 = jnp.sum(d * d, axis=-1)
        same = rows_g[:, None] == cg[None, :]
        m = (
            (d2 <= r2)
            & same
            & cvalid[None, :]
            & rows_valid[:, None]
            & (rows_idx[:, None] != idx_c[None, :])
        )
        return m, idx_c

    # ---- pass 1: density ----
    def density_body(_, c):
        r0 = c * chunk
        rows_idx = r0 + jnp.arange(chunk, dtype=jnp.int32)
        m, _ = nbr_mask(c, pos_p[rows_idx], g_p[rows_idx], valid_p[rows_idx], rows_idx)
        return None, jnp.sum(m, axis=1).astype(jnp.int32)

    _, dens_chunks = jax.lax.scan(
        density_body, None, jnp.arange(nchunks, dtype=jnp.int32)
    )
    density_s = dens_chunks.reshape(-1)[:n]
    hp_s = (density_s >= min_pts) & valid_s
    hp_p = pad_to(hp_s, False)

    # ---- pass 2: min-label propagation over HP-HP edges ----
    init_label = jnp.where(hp_s, jnp.arange(n, dtype=jnp.int32), INF_I32)
    init_label_p = pad_to(init_label, INF_I32)

    def prop_once(label_p):
        def body(_, c):
            r0 = c * chunk
            rows_idx = r0 + jnp.arange(chunk, dtype=jnp.int32)
            m, idx_c = nbr_mask(
                c, pos_p[rows_idx], g_p[rows_idx], valid_p[rows_idx], rows_idx
            )
            m = m & hp_p[idx_c][None, :]  # only HP neighbors relay
            nbr_lab = jnp.where(m, label_p[idx_c][None, :], INF_I32)
            best = jnp.min(nbr_lab, axis=1)
            cur = label_p[rows_idx]
            new = jnp.where(hp_p[rows_idx], jnp.minimum(cur, best), cur)
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
        lab = prop_once(label_p)  # already npad long (nchunks * chunk)
        return jump(jump(lab))

    label_p = jax.lax.fori_loop(0, prop_iters, prop_body, init_label_p)
    label_s = label_p[:n]  # HP -> root (sorted index); LP/invalid -> INF

    # first ORIGINAL index per component (the reference's seed identity):
    # segment-min of original point index over members keyed by root.
    root_seg = jnp.where(hp_s, label_s, n)
    comp_first_orig = jax.ops.segment_min(
        jnp.where(hp_s, perm, INF_I32), root_seg, num_segments=n + 1
    )

    # ---- border LPs: within radius of >=1 HP, adopt comp with LARGEST
    # first-original-index (replicates last-BFS-wins, binary.cu:206-213) ----
    def border_body(_, c):
        r0 = c * chunk
        rows_idx = r0 + jnp.arange(chunk, dtype=jnp.int32)
        m, idx_c = nbr_mask(
            c, pos_p[rows_idx], g_p[rows_idx], valid_p[rows_idx], rows_idx
        )
        m = m & hp_p[idx_c][None, :]
        nbr_root = label_p[idx_c]  # (W,)
        nbr_first = jnp.where(
            m, comp_first_orig[jnp.clip(nbr_root, 0, n)][None, :], -1
        )  # (R, W) via broadcast
        best_first = jnp.max(nbr_first, axis=1)  # -1 if no HP neighbor
        amax = jnp.argmax(nbr_first, axis=1)  # (R,) column index
        best_root = nbr_root[amax]
        return None, (best_first, best_root)

    _, (bf_chunks, br_chunks) = jax.lax.scan(
        border_body, None, jnp.arange(nchunks, dtype=jnp.int32)
    )
    border_first = bf_chunks.reshape(-1)[:n]
    border_root = br_chunks.reshape(-1)[:n]
    is_border = (~hp_s) & valid_s & (border_first >= 0)
    root_all = jnp.where(hp_s, label_s, jnp.where(is_border, border_root, INF_I32))

    # ---- enumerate + order clusters ----
    has_comp = comp_first_orig[:n] != INF_I32  # roots that exist (indexed by root)
    comp_group = jax.ops.segment_min(
        jnp.where(hp_s, g_s, INF_I32), root_seg, num_segments=n + 1
    )[:n]
    # order clusters by (group, first_orig)
    order_g = jnp.where(has_comp, comp_group, INF_I32)
    order_f = jnp.where(has_comp, comp_first_orig[:n], INF_I32)
    root_index = jnp.arange(n, dtype=jnp.int32)
    og, of, oroot = jax.lax.sort((order_g, order_f, root_index), num_keys=2)
    ncomp = jnp.sum(has_comp.astype(jnp.int32))
    # rank of each root: scatter position
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
        (cid_all < cluster_cap).astype(jnp.int32), cid_all, num_segments=cluster_cap + 1
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
        orig_p = pad_to(orig_s, 1e9)
        assigned_p = pad_to(assigned, False)
        cid_p = pad_to(cid_filtered, -1)

        def nn_body(carry, c):
            best_d, best_cid = carry
            cstart = c * chunk
            cand_idx = cstart + jnp.arange(chunk, dtype=jnp.int32)
            cpos = orig_p[cand_idx]
            cg = g_p[cand_idx]
            cok = assigned_p[cand_idx]
            d = orig_s[:, None, :] - cpos[None, :, :]
            d2 = jnp.sum(d * d, axis=-1)
            m = cok[None, :] & (cg[None, :] == g_s[:, None])
            d2 = jnp.where(m, d2, jnp.inf)
            j = jnp.argmin(d2, axis=1)
            dmin = jnp.take_along_axis(d2, j[:, None], 1)[:, 0]
            cbest = cid_p[cand_idx][j]
            upd = dmin <= best_d  # <=: later candidate wins ties like the ref
            return (jnp.where(upd, dmin, best_d), jnp.where(upd, cbest, best_cid)), None

        (best_d, best_cid), _ = jax.lax.scan(
            nn_body,
            (jnp.full((n,), jnp.inf), jnp.full((n,), -1, jnp.int32)),
            jnp.arange(nchunks, dtype=jnp.int32),
        )
        need = (~assigned) & valid_s
        cid_final_s = jnp.where(need, best_cid, cid_filtered)
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

    band_overflow = jnp.sum(
        ((lb < row_ids_all[:n] - half) | (ub > row_ids_all[:n] + half + 1))
        & valid_s
    ).astype(jnp.int32)

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
