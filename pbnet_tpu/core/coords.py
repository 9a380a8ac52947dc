"""Coordinate keys for the sparse-voxel engine.

A sparse tensor's coordinates are int32 rows ``[b, x, y, z]`` (batch item plus
3D voxel coordinates, all non-negative).  TPU-native design constraints:

* Everything is static-shape: arrays are padded to a fixed capacity and carry a
  validity mask.  Invalid rows use a sentinel key that sorts last and never
  matches a lookup.
* No int64: a coordinate is packed into a *pair* of int32 keys

      hi = b * 4096 + x          (x < 4096, b < 2**19)
      lo = y * 65536 + z         (y, z < 65536)

  Pairs are sorted lexicographically with ``jax.lax.sort(num_keys=2)`` and
  looked up with a vectorized binary search — both are plain XLA ops that
  compile to efficient TPU code.

This module replaces the coordinate-hashing machinery of MinkowskiEngine's
coordinate manager (used by the reference via ``ME.SparseTensor`` /
``ME.utils.sparse_quantize``, see /root/reference/network/PBNet.py:117 and
/root/reference/datasets/scannetv2/dataset_preprocess.py:269).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Sentinel key for invalid/padding rows: sorts after every valid key.
SENTINEL = np.int32(2**31 - 1)

# Packing limits (see module docstring).
MAX_X = 4096
MAX_YZ = 65536
MAX_B = 2**31 // MAX_X  # 524288 batch items (proposal ids in stage 2/3)


def pack(coords: jnp.ndarray, valid: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pack int32 coordinates ``[b, x, y, z]`` -> (hi, lo) int32 key pair.

    Invalid rows map to (SENTINEL, SENTINEL).
    """
    b, x, y, z = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    hi = b * MAX_X + x
    lo = y * MAX_YZ + z
    hi = jnp.where(valid, hi, SENTINEL)
    lo = jnp.where(valid, lo, SENTINEL)
    return hi.astype(jnp.int32), lo.astype(jnp.int32)


def sort_perm(hi: jnp.ndarray, lo: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stable lexicographic sort by (hi, lo) -> (hi_s, lo_s, perm).

    TPU note: `lax.sort` compile time grows with operand count, so this is the
    ONE canonical sort shape — always exactly (int32, int32, int32) — and all
    payloads are permuted by gathering through ``perm``.  Every call site then
    shares a single compiled sort per array length.
    """
    n = hi.shape[0]
    perm = jnp.arange(n, dtype=jnp.int32)
    hi_s, lo_s, perm_s = jax.lax.sort((hi, lo, perm), num_keys=2, is_stable=True)
    return hi_s, lo_s, perm_s


def sort_by_key(hi: jnp.ndarray, lo: jnp.ndarray, *payloads: jnp.ndarray):
    """Stable lexicographic sort by (hi, lo); payloads are permuted along axis 0.

    Returns ``(hi_sorted, lo_sorted, *payloads_sorted)``.
    """
    hi_s, lo_s, perm_s = sort_perm(hi, lo)
    return (hi_s, lo_s, *[jnp.take(p, perm_s, axis=0) for p in payloads])


def lookup(
    sorted_hi: jnp.ndarray,
    sorted_lo: jnp.ndarray,
    query_hi: jnp.ndarray,
    query_lo: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Find each query key in a sorted, duplicate-free key array.

    Vectorized lower-bound binary search on the (hi, lo) pair.  Returns
    ``(idx, found)`` where ``idx`` is the position of the match (int32,
    undefined where ``found`` is False).
    """
    n = sorted_hi.shape[0]
    # ceil(log2(n)) + 1 iterations cover the whole range; a fori_loop keeps
    # the HLO small (an unrolled search at every conv-map call site made
    # compile time explode).
    iters = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)

    def body(_, carry):
        lo_idx, hi_idx = carry
        mid = (lo_idx + hi_idx) // 2
        mid_c = jnp.minimum(mid, n - 1)
        mhi = sorted_hi[mid_c]
        mlo = sorted_lo[mid_c]
        less = (mhi < query_hi) | ((mhi == query_hi) & (mlo < query_lo))
        return (
            jnp.where(less, mid + 1, lo_idx),
            jnp.where(less, hi_idx, mid),
        )

    lo_idx, hi_idx = jax.lax.fori_loop(
        0, iters, body,
        (jnp.zeros(query_hi.shape, jnp.int32), jnp.full(query_hi.shape, n, jnp.int32)),
    )
    pos = jnp.minimum(lo_idx, n - 1)
    found = (
        (lo_idx < n)
        & (sorted_hi[pos] == query_hi)
        & (sorted_lo[pos] == query_lo)
        & (query_hi != SENTINEL)
    )
    return pos.astype(jnp.int32), found


def unique_sorted(
    hi_sorted: jnp.ndarray, lo_sorted: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """First-occurrence flags / unique positions for a sorted key array.

    Returns ``(first_flag, unique_pos, count)`` where ``unique_pos[i]`` is the
    index of row i's key among the unique keys (0-based, valid for all rows
    whose key is not SENTINEL), and ``count`` is the number of unique non-pad
    keys.
    """
    n = hi_sorted.shape[0]
    prev_hi = jnp.concatenate([jnp.array([-1], jnp.int32), hi_sorted[:-1]])
    prev_lo = jnp.concatenate([jnp.array([-1], jnp.int32), lo_sorted[:-1]])
    first = (hi_sorted != prev_hi) | (lo_sorted != prev_lo)
    valid = hi_sorted != SENTINEL
    first = first & valid
    unique_pos = jnp.cumsum(first.astype(jnp.int32)) - 1
    count = jnp.sum(first.astype(jnp.int32))
    return first, unique_pos, count


# ------------------------------------------------------------------
# NumPy oracle (host-side reference used by the data pipeline & tests)
# ------------------------------------------------------------------


def pack_np(coords: np.ndarray) -> np.ndarray:
    """Pack coordinates into a single int64 key (host-side only)."""
    c = coords.astype(np.int64)
    return ((c[:, 0] * MAX_X + c[:, 1]) << 32) | (c[:, 2] * MAX_YZ + c[:, 3])
