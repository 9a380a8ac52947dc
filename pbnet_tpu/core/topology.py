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


@flax.struct.dataclass
class DenseGrid:
    """Dense voxel-occupancy lookup table for one SparseLevel.

    Maps a coordinate directly to its row index with ONE gather — the
    replacement for the 17-round binary search, whose serial HBM gathers
    dominated topology-build latency (~54M gathered elements/s on v5e).
    Memory: prod(dims)/stride^3 int32, transient per build.
    """

    table: jnp.ndarray  # (B * X/s * Y/s * Z/s,) int32 row ids, -1 = empty
    overflow: jnp.ndarray  # () int32: valid voxels outside the extent
    dims: tuple = flax.struct.field(pytree_node=False)  # (B, X/s, Y/s, Z/s)
    stride: int = flax.struct.field(pytree_node=False)

    def lookup(self, coords4, qvalid):
        return grid_lookup(self, coords4, qvalid)


def build_grid(level: SparseLevel, extent: tuple) -> DenseGrid:
    """extent: (B, X, Y, Z) in stride-1 voxel units (static)."""
    s = level.stride
    dims = (extent[0], -(-extent[1] // s), -(-extent[2] // s), -(-extent[3] // s))
    c = level.coords
    q = c[:, 1:] // s
    b = c[:, 0]
    ok = (
        level.valid
        & (b >= 0) & (b < dims[0])
        & jnp.all(q >= 0, axis=1)
        & (q[:, 0] < dims[1]) & (q[:, 1] < dims[2]) & (q[:, 2] < dims[3])
    )
    size = dims[0] * dims[1] * dims[2] * dims[3]
    flat = ((b * dims[1] + q[:, 0]) * dims[2] + q[:, 1]) * dims[3] + q[:, 2]
    rows = jnp.arange(level.cap, dtype=jnp.int32)
    table = jnp.full((size + 1,), -1, jnp.int32).at[
        jnp.where(ok, flat, size)
    ].set(rows)[:size]
    overflow = jnp.sum((level.valid & ~ok).astype(jnp.int32))
    return DenseGrid(table=table, overflow=overflow, dims=dims, stride=s)


def grid_lookup(grid: DenseGrid, coords4: jnp.ndarray, qvalid: jnp.ndarray):
    """coords4 (Q, 4) raw coordinates -> (idx, found)."""
    s = grid.stride
    dims = grid.dims
    b = coords4[:, 0]
    xyz = coords4[:, 1:]
    q = xyz // s
    on_grid = jnp.all(xyz - q * s == 0, axis=1)  # must lie on this stride's grid
    ok = (
        qvalid & on_grid
        & (b >= 0) & (b < dims[0])
        & jnp.all(q >= 0, axis=1)
        & (q[:, 0] < dims[1]) & (q[:, 1] < dims[2]) & (q[:, 2] < dims[3])
    )
    size = dims[0] * dims[1] * dims[2] * dims[3]
    flat = ((b * dims[1] + q[:, 0]) * dims[2] + q[:, 1]) * dims[3] + q[:, 2]
    row = jnp.take(grid.table, jnp.where(ok, flat, 0), axis=0, mode="clip")
    found = ok & (row >= 0)
    return jnp.where(found, row, 0).astype(jnp.int32), found


@flax.struct.dataclass
class PidGrid:
    """Composite lookup for per-proposal (local-scene / ScoreNet) levels.

    Local-scene coordinates are ``(pid, x, y, z)`` where (x, y, z) lies on the
    SAME global voxel lattice as the main scene (the reference re-voxelizes
    local scenes at the same 2 cm grid, /root/reference/network/PBNet.py:236,
    261).  A dense grid over ``pid x spatial-extent`` would be enormous, but
    composing the main scene's dense grid (spatial -> global voxel rank g)
    with a dense ``(pid, g)`` table is exact and costs two gathers.
    """

    spatial: DenseGrid  # (b, x, y, z) -> global rank g at this stride
    table: jnp.ndarray  # (pid_cap * main_cap,) int32 local rows, -1 empty
    pid_batch: jnp.ndarray  # (pid_cap,) int32 scene-batch of each proposal
    overflow: jnp.ndarray  # () int32 local voxels absent from the main level
    pid_cap: int = flax.struct.field(pytree_node=False)
    main_cap: int = flax.struct.field(pytree_node=False)

    def lookup(self, coords4, qvalid):
        pid = coords4[:, 0]
        ok = qvalid & (pid >= 0) & (pid < self.pid_cap)
        b = jnp.take(self.pid_batch, jnp.clip(pid, 0, self.pid_cap - 1))
        sc = jnp.concatenate([b[:, None], coords4[:, 1:]], axis=1)
        g, found = grid_lookup(self.spatial, sc, ok)
        flat = jnp.where(found, pid * self.main_cap + g, self.pid_cap * self.main_cap)
        row = jnp.take(self.table, jnp.minimum(flat, self.table.shape[0] - 1),
                       axis=0, mode="clip")
        found2 = found & (row >= 0)
        return jnp.where(found2, row, 0).astype(jnp.int32), found2


def build_pid_grid(level: SparseLevel, main_level: SparseLevel,
                   extent: tuple, pid_batch: jnp.ndarray,
                   pid_cap: int) -> PidGrid:
    """Build the composite grid for a per-proposal level.

    ``main_level``: the main-scene level at the same stride; ``pid_batch``:
    proposal -> scene-batch map.
    """
    spatial = build_grid(main_level, extent)
    main_cap = main_level.cap
    pid = level.coords[:, 0]
    ok = level.valid & (pid >= 0) & (pid < pid_cap)
    b = jnp.take(pid_batch, jnp.clip(pid, 0, pid_cap - 1))
    sc = jnp.concatenate([b[:, None], level.coords[:, 1:]], axis=1)
    g, found = grid_lookup(spatial, sc, ok)
    okf = ok & found
    size = pid_cap * main_cap
    flat = jnp.where(okf, pid * main_cap + g, size)
    rows = jnp.arange(level.cap, dtype=jnp.int32)
    table = jnp.full((size + 1,), -1, jnp.int32).at[flat].set(rows)[:size]
    overflow = jnp.sum((level.valid & ~okf).astype(jnp.int32))
    return PidGrid(spatial=spatial, table=table, pid_batch=pid_batch,
                   overflow=overflow, pid_cap=pid_cap, main_cap=main_cap)


def conv_map(
    out_level: SparseLevel, in_level: SparseLevel, k: int,
    grid: "DenseGrid | None" = None,
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
    return _lookup_offsets(out_level, in_level, offs, grid)


def conv_transpose_map(
    out_level: SparseLevel, in_level: SparseLevel, k: int,
    grid: "DenseGrid | None" = None,
) -> jnp.ndarray:
    """Kernel map for a transposed convolution (coarse -> cached fine level).

    Offset ``d`` (in fine-stride units) contributes ``in[fine - d*ts_fine]``;
    the weight at index ``d`` is the same one the forward strided conv would
    use for ``fine = coarse + d*ts_fine``.
    """
    offs = -kernel_offsets(k) * out_level.stride
    return _lookup_offsets(out_level, in_level, offs, grid)


def _lookup_offsets(
    out_level: SparseLevel, in_level: SparseLevel, offs: np.ndarray,
    grid: "DenseGrid | None" = None,
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
    if grid is not None:
        idx, found = grid.lookup(qflat, qvalid)
    else:
        qhi, qlo = ck.pack(qflat, qvalid)
        idx, found = ck.lookup(in_level.hi, in_level.lo, qhi, qlo)
    idx = jnp.where(found, idx, -1)
    return idx.reshape(m, K)


def point_to_voxel_map(level: SparseLevel, xyz: jnp.ndarray, batch: jnp.ndarray,
                       valid: jnp.ndarray, voxel_size: float = 1.0,
                       grid: "DenseGrid | None" = None) -> jnp.ndarray:
    """Map points to voxel rows of ``level`` (for voxel->point feature gather)."""
    q = jnp.floor(xyz / voxel_size).astype(jnp.int32)
    q = (q // level.stride) * level.stride
    c4 = jnp.concatenate([batch[:, None].astype(jnp.int32), q], axis=1)
    if grid is not None:
        idx, found = grid.lookup(c4, valid)
    else:
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
    # () int32 diagnostics: voxels beyond level caps / outside grid extents
    level_overflow: jnp.ndarray = 0
    grid_overflow: jnp.ndarray = 0


def build_unet_topology(
    level0: SparseLevel,
    caps: Sequence[int],
    num_levels: int = 5,
    stem_k: int = 5,
    extent: "tuple | None" = None,
    grids=None,
) -> UNetTopology:
    """Build the full coordinate pyramid + kernel maps for a MinkUNet.

    ``caps[l]`` is the static voxel capacity of level ``l`` (caps[0] must
    equal level0.cap).  Kernel maps at equal stride are built once and shared
    by every residual block at that stride — the kernel-map reuse that drives
    sparse-conv throughput.

    ``extent`` (B, X, Y, Z): when given, lookups use a dense occupancy grid
    (one gather) instead of binary search (~17 serial gathers) — an order of
    magnitude faster on TPU.  Coordinates beyond the extent fall back to
    "missing" and are counted in the per-level grid overflow.
    """
    levels = [level0]
    for l in range(1, num_levels):
        levels.append(downsample(levels[-1], 2, caps[l]))
    if grids is None:
        grids = [build_grid(lv, extent) if extent is not None else None
                 for lv in levels]
    elif callable(grids):
        grids = [grids(lv) for lv in levels]
    k3 = tuple(conv_map(lv, lv, 3, g) for lv, g in zip(levels, grids))
    down = tuple(
        conv_map(levels[l + 1], levels[l], 2, grids[l])
        for l in range(num_levels - 1)
    )
    up = tuple(
        conv_transpose_map(levels[l], levels[l + 1], 2, grids[l + 1])
        for l in range(num_levels - 1)
    )
    stem = conv_map(levels[0], levels[0], stem_k, grids[0])
    level_overflow = sum(
        jnp.maximum(lv.count - lv.cap, 0) for lv in levels
    )
    grid_overflow = sum(
        (g.overflow if g is not None else jnp.int32(0)) for g in grids
    )
    return UNetTopology(
        levels=tuple(levels), stem_map=stem, k3_maps=k3,
        down_maps=down, up_maps=up,
        level_overflow=jnp.int32(level_overflow),
        grid_overflow=jnp.int32(grid_overflow),
    )
