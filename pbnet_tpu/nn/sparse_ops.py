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

import jax
import jax.numpy as jnp


def gather_conv(
    feats: jnp.ndarray,  # (M_in, Cin)
    kmap: jnp.ndarray,  # (M_out, K) int32, -1 = missing input
    weights: jnp.ndarray,  # (K, Cin, Cout)
    valid_out: jnp.ndarray,  # (M_out,) bool
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Sparse convolution as gather + GEMM.  Returns (M_out, Cout)."""
    g = jnp.take(feats, kmap, axis=0, mode="fill", fill_value=0)  # (M, K, Cin)
    k, cin, cout = weights.shape
    y = jax.lax.dot_general(
        g.reshape(g.shape[0], k * cin),
        weights.reshape(k * cin, cout),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias
    return jnp.where(valid_out[:, None], y, 0.0)


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
