"""Voxel quantization (the `ME.utils.sparse_quantize` replacement).

Two implementations with identical semantics:

* :func:`sparse_quantize_np` — host numpy, used by the data pipeline exactly
  where the reference calls ``ME.utils.sparse_quantize(..., return_index=True,
  return_inverse=True)`` (/root/reference/datasets/scannetv2/
  dataset_preprocess.py:269-272).
* :func:`sparse_quantize_device` — jittable, static-shape, used inside the
  model forward for stage-2 local scenes and stage-3 proposals, where the
  reference re-voxelizes on device via ``ME.SparseTensor`` construction
  (/root/reference/network/PBNet.py:236-246, 259-271).

Semantics: coordinates are ``floor(xyz / voxel_size)``; duplicates within the
same batch item collapse to one voxel whose features are taken from the first
occurrence (lowest input row index); the inverse map sends every input row to
its voxel row.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import coords as ck


def sparse_quantize_np(xyz: np.ndarray, voxel_size: float):
    """Quantize points on host.

    Args:
      xyz: (N, 3) float array, non-negative.
      voxel_size: quantization cell size.

    Returns:
      (vox_coords (M,3) int32, index (M,) int64 first-occurrence rows,
       inverse (N,) int64 point->voxel map)
    """
    q = np.floor(xyz / voxel_size).astype(np.int64)
    # Single scalar key per row for np.unique.
    key = (q[:, 0] * ck.MAX_YZ + q[:, 1]) * ck.MAX_YZ + q[:, 2]
    _, index, inverse = np.unique(key, return_index=True, return_inverse=True)
    return q[index].astype(np.int32), index.astype(np.int64), inverse.astype(np.int64)


def quantize_device(
    xyz: jnp.ndarray,
    batch: jnp.ndarray,
    valid: jnp.ndarray,
    voxel_cap: int,
    voxel_size: float = 1.0,
):
    """Jittable static-shape quantization of batched points.

    Args:
      xyz: (P, 3) float32 coordinates (non-negative; divided by voxel_size
        internally).
      batch: (P,) int32 batch-item (or proposal) id per point.
      valid: (P,) bool point validity mask.
      voxel_cap: static capacity M of the voxel arrays.
      voxel_size: quantization cell size.

    Returns a dict with:
      coords:  (M, 4) int32 voxel [b,x,y,z], sorted by key, pads = SENTINEL-ish
      hi, lo:  (M,) int32 sorted key pair (pads = SENTINEL)
      vvalid:  (M,) bool voxel validity
      count:   () int32 number of voxels (may exceed M: overflow indicator)
      point2voxel: (P,) int32 map from each input point to its voxel row
        (pads/overflow -> -1)
      voxel2point: (M,) int32 first input point of each voxel (pads -> 0)
    """
    p = xyz.shape[0]
    q = jnp.floor(xyz / voxel_size).astype(jnp.int32)
    c4 = jnp.concatenate([batch[:, None].astype(jnp.int32), q], axis=1)
    hi, lo = ck.pack(c4, valid)
    row = jnp.arange(p, dtype=jnp.int32)
    hi_s, lo_s, c4_s, row_s = ck.sort_by_key(hi, lo, c4, row)
    first, unique_pos, count = ck.unique_sorted(hi_s, lo_s)

    m = voxel_cap
    ok = first & (unique_pos < m)
    dst = jnp.where(ok, unique_pos, m)  # overflow rows dumped into slot m
    # Scatter unique rows into the padded voxel arrays (slot m is scratch).
    vox_coords = jnp.zeros((m + 1, 4), jnp.int32).at[dst].set(c4_s)[:m]
    vox_hi = jnp.full((m + 1,), ck.SENTINEL, jnp.int32).at[dst].set(
        jnp.where(ok, hi_s, ck.SENTINEL)
    )[:m]
    vox_lo = jnp.full((m + 1,), ck.SENTINEL, jnp.int32).at[dst].set(
        jnp.where(ok, lo_s, ck.SENTINEL)
    )[:m]
    # First point of each voxel: sort is stable, so the first row of a
    # duplicate run has the lowest original index among... rows were sorted by
    # key only; stability preserves input order within ties, so row_s at the
    # first flag is the lowest original row of that voxel.
    vox2pt = jnp.zeros((m + 1,), jnp.int32).at[dst].set(row_s)[:m]
    vvalid = vox_hi != ck.SENTINEL

    # Point -> voxel: each sorted row's unique_pos, mapped back to input order.
    p2v_sorted = jnp.where((unique_pos < m) & (hi_s != ck.SENTINEL), unique_pos, -1)
    point2voxel = jnp.full((p,), -1, jnp.int32).at[row_s].set(p2v_sorted)

    return {
        "coords": vox_coords,
        "hi": vox_hi,
        "lo": vox_lo,
        "valid": vvalid,
        "count": count,
        "point2voxel": point2voxel,
        "voxel2point": vox2pt,
    }
