"""Functional sparse-tensor ops: gather-GEMM convolution, pooling.

The convolution formulation is TPU-first: a kernel map (see core/topology.py)
turns sparse convolution into ``gather -> one big GEMM`` with *uniform* static
shapes — no scatter, because each (output voxel, kernel offset) pair has at
most one input voxel.  The GEMM is ``(M, K*Cin) @ (K*Cin, Cout)``, which XLA
tiles straight onto the MXU.  This replaces MinkowskiEngine's
gather-GEMM-scatter sparse conv used throughout the reference
(/root/reference/network/Mink.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# Conv compute dtype: bf16 img2col + weights with f32 accumulation halves the
# dominant HBM traffic (the (M, K, Cin) gather buffer) at matmul-standard
# precision.  Flip to jnp.float32 for strict-parity comparisons.
COMPUTE_DTYPE = jnp.bfloat16


def _window_img2col(feats, kmap, kz):
    """img2col via z-window row gathers: K/kz gathers per output row.

    Kernel offsets enumerate dz fastest, so each aligned kz-column block of
    the kernel map shares one (dx, dy) column of the voxel lattice.  Present
    members of a block occupy CONSECUTIVE rows of the (key-sorted) input
    level (rank order == key order within a z-column; the level's lattice has
    no voxels between adjacent dz candidates).  So ONE row gather of a
    kz-stacked feature table at the block's min index fetches every member,
    and a cheap (pos == t) select rebuilds the per-slot layout.  Pays off
    only for NARROW rows (see _WINDOW_MAX_CH), where gathers are
    op-count-bound; wide rows are byte-bound and the stacked table moves the
    same bytes.

    Also correct for column-reversed maps (kmap_bwd = kmap[:, ::-1]):
    reversal maps aligned blocks to aligned blocks and the reconstruction
    never assumes dz is ascending.
    """
    m, K = kmap.shape
    cin = feats.shape[1]
    G = K // kz
    assert G * kz == K, (K, kz)
    f = feats.astype(COMPUTE_DTYPE)
    # stacked table: fS[a] = [f[a], f[a+1], ..., f[a+kz-1]]  (zero pad at end)
    parts = [f]
    for t in range(1, kz):
        parts.append(
            jnp.concatenate([f[t:], jnp.zeros((t, cin), f.dtype)], axis=0)
        )
    fS = jnp.concatenate(parts, axis=1)  # (M_in, kz*Cin)

    km3 = kmap.reshape(m, G, kz)
    present = km3 >= 0
    big = jnp.int32(2**30)
    anchor = jnp.min(jnp.where(present, km3, big), axis=2)  # (M, G)
    anchor_c = jnp.where(anchor < big, anchor, 0)
    win = jnp.take(fS, anchor_c, axis=0, mode="clip").reshape(m, G, kz, cin)
    pos = km3 - anchor_c[:, :, None]  # window position of each slot
    g = jnp.zeros((m, G, kz, cin), f.dtype)
    for t in range(kz):
        g = g + jnp.where(
            (present & (pos == t))[..., None], win[:, :, t : t + 1, :], 0
        )
    return g.reshape(m, K * cin)


# Row width (channels) below which z-window gathers win.  Measured on v5e:
# gathers are op-count-bound for narrow rows (6ch stem: 61 -> 48 ms) but
# byte-bound for wide ones (96ch k3: windows LOSE, 40 -> 52 ms, because the
# kz-stacked table moves the same bytes plus select overhead).
_WINDOW_MAX_CH = 16


def _conv_fwd_math(feats, kmap, weights, valid_out, kz=None):
    k, cin, cout = weights.shape
    if kz is not None and kz > 1 and cin <= _WINDOW_MAX_CH:
        g = _window_img2col(feats, kmap, kz)
    else:
        g = jnp.take(
            feats.astype(COMPUTE_DTYPE), kmap, axis=0, mode="fill", fill_value=0
        ).reshape(kmap.shape[0], k * cin)
    y = jax.lax.dot_general(
        g,
        weights.astype(COMPUTE_DTYPE).reshape(k * cin, cout),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.where(valid_out[:, None], y, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_conv_core(kz, feats, kmap, kmap_bwd, weights, valid_out):
    """Sparse conv whose BACKWARD is also a gather-GEMM.

    XLA differentiates a gather into a scatter-add, and random scatters run
    at ~54M elements/s on v5e — conv backwards dominated the train step
    (86 s/step before this).  But every kernel map's transpose IS another
    kernel map: output i reads input j at offset d  <=>  input j is read by
    output at coordinate (j - d).  ``kmap_bwd[j, k]`` must hold the output
    row that reads input j at forward-offset k:

    * same-level (odd-k) maps: the column-reversed map itself (-d enumerates
      at index K-1-k)
    * strided conv (k=2 s=2): the transpose-conv map of the same level pair
    * transposed conv: the strided-conv map

    so no extra lookups are ever built.  ``kz`` (static) enables z-window
    gathers in both directions (see _window_img2col).
    """
    return _conv_fwd_math(feats, kmap, weights, valid_out, kz)


def _gc_fwd(kz, feats, kmap, kmap_bwd, weights, valid_out):
    y = _conv_fwd_math(feats, kmap, weights, valid_out, kz)
    return y, (feats, kmap, kmap_bwd, weights, valid_out)


def _gc_bwd(kz, res, dy):
    feats, kmap, kmap_bwd, weights, valid_out = res
    dy = jnp.where(valid_out[:, None], dy, 0.0).astype(COMPUTE_DTYPE)
    k, cin, cout = weights.shape
    # One backward gather serves BOTH grads: gy[j,k] = dy[output reading j at
    # forward-offset k].
    if kz is not None and kz > 1 and cout <= _WINDOW_MAX_CH:
        gy = _window_img2col(dy, kmap_bwd, kz).reshape(
            kmap_bwd.shape[0], k, cout
        )
    else:
        gy = jnp.take(dy, kmap_bwd, axis=0, mode="fill", fill_value=0)  # (Min,K,Cout)
    # dx[j] = sum_k gy[j,k] @ W[k]^T
    wt = jnp.swapaxes(weights.astype(COMPUTE_DTYPE), 1, 2).reshape(k * cout, cin)
    dx = jax.lax.dot_general(
        gy.reshape(gy.shape[0], k * cout), wt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dW[k] = sum_i x[kmap[i,k]] dy[i] = sum_j x[j] gy[j,k]  (substituting
    # j = kmap[i,k] <=> i = kmap_bwd[j,k]) — no re-gather of x needed.
    dw = jax.lax.dot_general(
        feats.astype(COMPUTE_DTYPE), gy.reshape(gy.shape[0], k * cout),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(cin, k, cout).transpose(1, 0, 2)
    return dx, None, None, dw, None


_gather_conv_core.defvjp(_gc_fwd, _gc_bwd)

# hypercube kernel volume -> z-run length (offsets enumerate dz fastest)
_KZ_OF = {125: 5, 27: 3, 8: 2}


def gather_conv(
    feats: jnp.ndarray,  # (M_in, Cin)
    kmap: jnp.ndarray,  # (M_out, K) int32, -1 = missing input
    weights: jnp.ndarray,  # (K, Cin, Cout)
    valid_out: jnp.ndarray,  # (M_out,) bool
    bias: jnp.ndarray | None = None,
    kmap_bwd: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Sparse convolution as gather + GEMM.  Returns (M_out, Cout).

    When ``kmap_bwd`` is given, the backward pass is a gather-GEMM too (see
    ``_gather_conv_core``); otherwise autodiff falls back to scatter-add.
    Hypercube kernel maps use z-window gathers (see _window_img2col).
    """
    kz = _KZ_OF.get(kmap.shape[1])
    if kmap_bwd is None:
        y = _conv_fwd_math(feats, kmap, weights, valid_out, kz)
    else:
        y = _gather_conv_core(kz, feats, kmap, kmap_bwd, weights, valid_out)
    if bias is not None:
        y = jnp.where(valid_out[:, None], y + bias, 0.0)
    return y


def max_pool(
    feats: jnp.ndarray, kmap: jnp.ndarray, valid_out: jnp.ndarray
) -> jnp.ndarray:
    """Max pooling over the kernel-map neighborhood (e.g. k=2 s=2)."""
    g = jnp.take(feats, kmap, axis=0, mode="fill", fill_value=-jnp.inf)
    present = (kmap >= 0)[:, :, None]
    g = jnp.where(present, g, -jnp.inf)
    y = jnp.max(g, axis=1)
    y = jnp.where(jnp.any(present, axis=1), y, 0.0)
    return jnp.where(valid_out[:, None], y, 0.0)


def global_pool(
    feats: jnp.ndarray,  # (M, C)
    batch_ids: jnp.ndarray,  # (M,) int32
    valid: jnp.ndarray,  # (M,) bool
    num_segments: int,
    mode: str,
) -> jnp.ndarray:
    """Per-batch-item global pooling over valid voxels -> (num_segments, C).

    Replaces ME.MinkowskiGlobalMax/AvgPooling used by the ScoreNet head
    (/root/reference/network/PBNet.py:67-68,274-276).
    """
    seg = jnp.where(valid, batch_ids, num_segments)
    if mode == "max":
        y = jax.ops.segment_max(
            jnp.where(valid[:, None], feats, -jnp.inf),
            seg,
            num_segments=num_segments + 1,
        )[:num_segments]
        return jnp.where(jnp.isfinite(y), y, 0.0)
    if mode == "avg":
        s = jax.ops.segment_sum(
            jnp.where(valid[:, None], feats, 0.0),
            seg,
            num_segments=num_segments + 1,
        )[:num_segments]
        cnt = jax.ops.segment_sum(
            valid.astype(feats.dtype), seg, num_segments=num_segments + 1
        )[:num_segments]
        return s / jnp.maximum(cnt, 1.0)[:, None]
    raise ValueError(mode)
