"""Sparse-tensor topology: coordinate pyramids and kernel maps.

This is the MinkowskiEngine coordinate-manager replacement, redesigned for
TPU/XLA: everything is built *on device* with static shapes.

A ``SparseLevel`` holds the (padded, key-sorted) voxel coordinates at one
tensor stride.  A *kernel map* for a convolution is an ``(M_out, K)`` int32
table: entry ``[i, k]`` is the input row that offset ``k`` of output voxel
``i`` reads from, or ``-1`` when that input voxel does not exist.  The
convolution itself is then a dense gather + GEMM (see ``nn/sparse_ops.py``) —
uniform MXU work instead of the reference's scatter-based gather-GEMM-scatter
(MinkowskiEngine kernel maps, cf. /root/reference/network/Mink.py throughout).

Kernel offset enumeration (must stay consistent with the weight layout):
for odd k, offsets span ``[-(k//2), k//2]``; for even k, ``[0, k)`` — matching
MinkowskiEngine's hypercube kernel region so a weight converter stays simple.
Offsets iterate x-major (dx slowest, dz fastest).

Output coordinates of a stride-``s`` convolution are
``unique(floor(c / (ts*s)) * (ts*s))`` over the input coordinates — the same
rule MinkowskiEngine applies for strided convolutions, which is what the
MinkUNet encoder relies on (/root/reference/network/Mink.py:226-251).
"""

from __future__ import annotations

from typing import Sequence

import flax.struct
import jax.numpy as jnp
import numpy as np

from . import coords as ck


@flax.struct.dataclass
class SparseLevel:
    """Padded, key-sorted voxel set at one tensor stride."""

    coords: jnp.ndarray  # (M, 4) int32 [b, x, y, z]; rows sorted by key
    hi: jnp.ndarray  # (M,) int32 sorted key (pads = SENTINEL)
    lo: jnp.ndarray  # (M,) int32
    valid: jnp.ndarray  # (M,) bool
    count: jnp.ndarray  # () int32 true number of voxels (overflow detector)
    stride: int = flax.struct.field(pytree_node=False)

    @property
    def cap(self) -> int:
        return self.coords.shape[0]


def kernel_offsets(k: int) -> np.ndarray:
    """Hypercube kernel offsets, ME-compatible enumeration (x-major)."""
    if k % 2 == 1:
        r = range(-(k // 2), k // 2 + 1)
    else:
        r = range(0, k)
    return np.array(
        [(dx, dy, dz) for dx in r for dy in r for dz in r], dtype=np.int32
    )


def level_from_coords(coords4: jnp.ndarray, valid: jnp.ndarray, cap: int, stride: int) -> SparseLevel:
    """Build a SparseLevel from (already unique) unsorted coordinates."""
    hi, lo = ck.pack(coords4, valid)
    hi_s, lo_s, coords_s = ck.sort_by_key(hi, lo, coords4)
    count = jnp.sum(valid.astype(jnp.int32))
    if coords_s.shape[0] != cap:
        raise ValueError("cap mismatch")
    return SparseLevel(
        coords=coords_s, hi=hi_s, lo=lo_s, valid=hi_s != ck.SENTINEL,
        count=count, stride=stride,
    )


def level_from_quantize(q: dict, cap: int, stride: int = 1) -> SparseLevel:
    """Wrap the output of ``quantize.quantize_device`` as a SparseLevel."""
    del cap  # shapes already fixed by quantize_device
    return SparseLevel(
        coords=q["coords"], hi=q["hi"], lo=q["lo"], valid=q["valid"],
        count=q["count"], stride=stride,
    )


def downsample(level: SparseLevel, s: int, cap: int) -> SparseLevel:
    """Coordinates of the next level: unique(floor(c/(ts*s)) * (ts*s))."""
    ts = level.stride
    new_stride = ts * s
    c = level.coords
    down = jnp.concatenate(
        [c[:, :1], (c[:, 1:] // new_stride) * new_stride], axis=1
    )
    hi, lo = ck.pack(down, level.valid)
    hi_s, lo_s, down_s = ck.sort_by_key(hi, lo, down)
    first, unique_pos, count = ck.unique_sorted(hi_s, lo_s)
    ok = first & (unique_pos < cap)
    dst = jnp.where(ok, unique_pos, cap)
    out_coords = jnp.zeros((cap + 1, 4), jnp.int32).at[dst].set(down_s)[:cap]
    out_hi = jnp.full((cap + 1,), ck.SENTINEL, jnp.int32).at[dst].set(
        jnp.where(ok, hi_s, ck.SENTINEL)
    )[:cap]
    out_lo = jnp.full((cap + 1,), ck.SENTINEL, jnp.int32).at[dst].set(
        jnp.where(ok, lo_s, ck.SENTINEL)
    )[:cap]
    return SparseLevel(
        coords=out_coords, hi=out_hi, lo=out_lo,
        valid=out_hi != ck.SENTINEL, count=count, stride=new_stride,
    )


def conv_map(
    out_level: SparseLevel, in_level: SparseLevel, k: int
) -> jnp.ndarray:
    """Kernel map for a (possibly strided) convolution.

    Input voxel for output ``o`` and offset ``d`` sits at ``o + d * ts_in``.
    Covers stride-1 convs (out_level is in_level), strided convs (out_level is
    the downsampled level), and *transposed* convs: pass the cached finer
    level as ``out_level`` and query keys ``o + d*ts_out``; a coarse voxel
    only matches when ``o + d*ts_out`` lies on the coarse grid, which
    reproduces ME's transpose-conv kernel map (cf.
    /root/reference/network/Mink.py:253-276).

    For a transposed conv, offsets are *negated*: ME's transpose kernel map is
    the reverse of the forward map ``fine = coarse + d*ts_fine``, i.e.
    ``coarse = fine - d*ts_fine``.  Use :func:`conv_transpose_map`.

    Returns (M_out, K^3) int32 indices into in_level rows, -1 = missing.
    """
    offs = kernel_offsets(k) * in_level.stride
    return _lookup_offsets(out_level, in_level, offs)


def conv_transpose_map(
    out_level: SparseLevel, in_level: SparseLevel, k: int
) -> jnp.ndarray:
    """Kernel map for a transposed convolution (coarse -> cached fine level).

    Offset ``d`` (in fine-stride units) contributes ``in[fine - d*ts_fine]``;
    the weight at index ``d`` is the same one the forward strided conv would
    use for ``fine = coarse + d*ts_fine``.
    """
    offs = -kernel_offsets(k) * out_level.stride
    return _lookup_offsets(out_level, in_level, offs)


def _lookup_offsets(
    out_level: SparseLevel, in_level: SparseLevel, offs: np.ndarray
) -> jnp.ndarray:
    m = out_level.cap
    K = offs.shape[0]
    base = out_level.coords  # (M, 4)
    # (M, K, 4) query coordinates
    q = base[:, None, :] + jnp.concatenate(
        [jnp.zeros((K, 1), jnp.int32), jnp.asarray(offs)], axis=1
    )[None, :, :]
    qflat = q.reshape(m * K, 4)
    # Negative coordinates can occur at scene borders for centered kernels;
    # they are simply absent from the key set, but pack() requires
    # non-negative values — mask them invalid.
    qvalid = jnp.all(qflat[:, 1:] >= 0, axis=1) & jnp.repeat(
        out_level.valid, K, total_repeat_length=m * K
    )
    qhi, qlo = ck.pack(qflat, qvalid)
    idx, found = ck.lookup(in_level.hi, in_level.lo, qhi, qlo)
    idx = jnp.where(found, idx, -1)
    return idx.reshape(m, K)


def point_to_voxel_map(level: SparseLevel, xyz: jnp.ndarray, batch: jnp.ndarray,
                       valid: jnp.ndarray, voxel_size: float = 1.0) -> jnp.ndarray:
    """Map points to voxel rows of ``level`` (for voxel->point feature gather)."""
    q = jnp.floor(xyz / voxel_size).astype(jnp.int32)
    q = (q // level.stride) * level.stride
    c4 = jnp.concatenate([batch[:, None].astype(jnp.int32), q], axis=1)
    hi, lo = ck.pack(c4, valid)
    idx, found = ck.lookup(level.hi, level.lo, hi, lo)
    return jnp.where(found, idx, -1)


@flax.struct.dataclass
class UNetTopology:
    """All levels and kernel maps a MinkUNet forward needs.

    levels[0] is tensor stride 1; levels[i] stride 2**i.
    """

    levels: tuple  # tuple[SparseLevel]
    stem_map: jnp.ndarray  # (M0, stem_k^3) for the k=5 stem conv
    k3_maps: tuple  # per level: (M_l, 27) stride-1 k=3 map
    down_maps: tuple  # l -> l+1: (M_{l+1}, 8) k=2 s=2 conv map
    up_maps: tuple  # l+1 -> l: (M_l, 8) k=2 s=2 transpose map


def build_unet_topology(
    level0: SparseLevel,
    caps: Sequence[int],
    num_levels: int = 5,
    stem_k: int = 5,
) -> UNetTopology:
    """Build the full coordinate pyramid + kernel maps for a MinkUNet.

    ``caps[l]`` is the static voxel capacity of level ``l`` (caps[0] must
    equal level0.cap).  Kernel maps at equal stride are built once and shared
    by every residual block at that stride — the kernel-map reuse that drives
    sparse-conv throughput.
    """
    levels = [level0]
    for l in range(1, num_levels):
        levels.append(downsample(levels[-1], 2, caps[l]))
    k3 = tuple(conv_map(lv, lv, 3) for lv in levels)
    down = tuple(
        conv_map(levels[l + 1], levels[l], 2) for l in range(num_levels - 1)
    )
    up = tuple(
        conv_transpose_map(levels[l], levels[l + 1], 2)
        for l in range(num_levels - 1)
    )
    stem = conv_map(levels[0], levels[0], stem_k)
    return UNetTopology(
        levels=tuple(levels), stem_map=stem, k3_maps=k3,
        down_maps=down, up_maps=up,
    )
