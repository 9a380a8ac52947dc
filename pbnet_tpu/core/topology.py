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

Performance design (measured on the axon TPU):
* Scalar gathers are the expensive primitive (~100 ms per 12M from a 40 MB
  table) but still the best available: windowed ``lax.gather``
  (slice_sizes=(1, k)) lowers catastrophically (>1000x slower), and binary
  search costs ~17 serial gather rounds.  Lookup indices are computed with
  cheap BASE + static-delta arithmetic on a z-padded table (the pads hold
  -1, making the z bound check free).
* Transposed-conv maps are NOT looked up at all: the transpose kernel map is
  the exact inverse of the forward strided map (``down[j,k]=i <=> up[i,k]=j``),
  so 8 cheap column scatters replace 8*M scalar gathers.
* Dense grids are built once per level per forward and REUSED by the stem,
  k3, and down maps, the voxel->point map, and the per-proposal composite
  grids of the local-scene / ScoreNet topologies.
"""

from __future__ import annotations

from typing import Sequence

import flax.struct
import jax
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


# Z padding of the dense occupancy table: leaves room for z-window gathers of
# any supported kernel (max k//2 = 2 for the k=5 stem) without bound checks.
Z_PAD = 2


@flax.struct.dataclass
class DenseGrid:
    """Dense voxel-occupancy lookup table for one SparseLevel.

    Layout: ``table`` is (R + 1, Zp) int32 where R = B * Xs * Ys rows of the
    (batch, x, y) space, ``Zp = Zs + 2*Z_PAD`` columns of z (padded by -1 on
    both sides), and row R is an all ``-1`` dummy for out-of-extent queries.
    Every lookup is one scalar gather whose flat index is base + static
    delta; the z pads make out-of-range z reads return -1 without a branch.

    ``packed`` encodes the whole 5-entry z-window ``table[..., z-2..z+2]``
    of each (row, z) slot in ONE int32: ``(rank0 + 1) << 5 | mask`` where
    ``mask`` bit i marks presence at ``z - 2 + i`` and ``rank0`` is the row
    id of the FIRST present entry.  This is lossless because row ids are
    key-order ranks and nothing sorts between two voxels of one (b, x, y)
    column: present entries of any z-window hold CONSECUTIVE ids, so entry
    i = rank0 + popcount(mask below bit i).  One int32 lane per slot keeps
    the table 5x smaller than stacking the 5 shifts, and 1-lane gathers
    from big tables run ~2x faster than 5-lane rows (measured on v5e:
    5.9 ns/op flat vs ~12 ns/op once the stacked table spills cache).
    """

    table: jnp.ndarray  # (R + 1, Zp) int32 row ids, -1 = empty
    packed: jnp.ndarray  # ((R + 1) * Zp,) int32 (rank0+1)<<5 | presence mask
    overflow: jnp.ndarray  # () int32: valid voxels outside the extent
    # Optional (R*Zp + 1, (2r+1)^2) xy-stack: column j holds ``packed``
    # shifted by the j-th (dx, dy) in [-r, r]^2 (x-major), zero-padded at the
    # extent borders, with an all-zero dummy last row.  ONE row gather then
    # fetches the packed z-windows of EVERY (dx, dy) kernel group at once —
    # kernel-map builds drop from K2 gathers per voxel to 1 (see
    # grid_offsets_lookup).  Built only when the stack fits the memory gate
    # (XY_STACK_MAX_BYTES); None otherwise (e.g. multi-scene training grids).
    packed_xy: jnp.ndarray = None
    dims: tuple = flax.struct.field(pytree_node=False, default=None)  # (B, Xs, Ys, Zs)
    stride: int = flax.struct.field(pytree_node=False, default=1)
    xy_radius: int = flax.struct.field(pytree_node=False, default=0)

    def lookup(self, coords4, qvalid):
        return grid_lookup(self, coords4, qvalid)


def _grid_dims(extent: tuple, s: int) -> tuple:
    return (extent[0], -(-extent[1] // s), -(-extent[2] // s), -(-extent[3] // s))


# Memory gate for the xy-stacked packed table: a single-scene eval L0 grid
# (256x256x160, 25 shifts) is ~1.1 GB — worth it (kernel-map builds become
# one gather per voxel); a 4-scene training grid (512x512x256) would be
# ~27 GB — falls back to per-group lookups.
XY_STACK_MAX_BYTES = 1_400_000_000


def _stack_xy(packed: jnp.ndarray, dims: tuple, radius: int) -> jnp.ndarray:
    """Stack (dx, dy) in [-radius, radius]^2 shifts of the z-packed table.

    Returns (B*X*Y*Zp + 1, (2r+1)^2) int32; out-of-extent shifts hold 0
    (decodes to "no voxels"); the last row is an all-zero dummy for
    out-of-range queries.

    NOTE (round 5): the stack-axis-1 store pattern looks terrible in
    isolation (24 ms for the 1.06 GB L0 stack; stride-4B column stores) and
    five rewrites were measured — axis-0 stack + forced transpose (24.2),
    32-lane chunk concat (28.2), one-hot broadcast sum (22.1), a Pallas
    strided-store kernel (166!), and an exact-f32 depthwise-conv build
    (16.9 isolated, but DEFAULT conv precision mangles the packed integers
    to bf16, and with that fixed it is end-to-end NEUTRAL anyway).  The
    build is hidden by pipeline scheduling in situ (same conclusion as the
    r4 XY_STACK_MAX_BYTES=0 A/B): end-to-end 236.1 vs 235.6 ms.  Keep the
    simple exact formulation; do not retry without new evidence
    (perf/micro_stemmap.py has the harness).
    """
    B, X, Y, _ = dims
    zp = packed.shape[0] // (B * X * Y + 1)
    p3 = packed[: B * X * Y * zp].reshape(B, X, Y, zp)
    shifts = []
    for dx in range(-radius, radius + 1):
        for dy in range(-radius, radius + 1):
            sh = p3
            if dx > 0:
                sh = jnp.pad(sh[:, dx:], ((0, 0), (0, dx), (0, 0), (0, 0)))
            elif dx < 0:
                sh = jnp.pad(sh[:, :dx], ((0, 0), (-dx, 0), (0, 0), (0, 0)))
            if dy > 0:
                sh = jnp.pad(sh[:, :, dy:], ((0, 0), (0, 0), (0, dy), (0, 0)))
            elif dy < 0:
                sh = jnp.pad(sh[:, :, :dy], ((0, 0), (0, 0), (-dy, 0), (0, 0)))
            shifts.append(sh.reshape(-1))
    st = jnp.stack(shifts, axis=1)
    return jnp.concatenate([st, jnp.zeros((1, st.shape[1]), jnp.int32)], 0)


def build_grid(level: SparseLevel, extent: tuple,
               xy_radius: int = 0) -> DenseGrid:
    """extent: (B, X, Y, Z) in stride-1 voxel units (static).

    ``xy_radius > 0`` additionally builds the xy-stacked packed table
    covering kernel (dx, dy) offsets up to that radius in table units
    (2 serves the k=5 stem; 1 serves k=3 and k=2), subject to the
    XY_STACK_MAX_BYTES gate.
    """
    s = level.stride
    dims = _grid_dims(extent, s)
    c = level.coords
    q = c[:, 1:] // s
    b = c[:, 0]
    ok = (
        level.valid
        & (b >= 0) & (b < dims[0])
        & jnp.all(q >= 0, axis=1)
        & (q[:, 0] < dims[1]) & (q[:, 1] < dims[2]) & (q[:, 2] < dims[3])
    )
    nrows = dims[0] * dims[1] * dims[2]
    zp = dims[3] + 2 * Z_PAD
    size = (nrows + 1) * zp
    row = (b * dims[1] + q[:, 0]) * dims[2] + q[:, 1]
    flat = row * zp + q[:, 2] + Z_PAD
    rows = jnp.arange(level.cap, dtype=jnp.int32)
    table = jnp.full((size,), -1, jnp.int32).at[
        jnp.where(ok, flat, size - 1)
    ].set(jnp.where(ok, rows, -1), mode="drop").reshape(nrows + 1, zp)
    packed = _pack_z(table)
    overflow = jnp.sum((level.valid & ~ok).astype(jnp.int32))
    packed_xy = None
    if xy_radius > 0:
        stack_bytes = (nrows * zp + 1) * (2 * xy_radius + 1) ** 2 * 4
        if stack_bytes <= XY_STACK_MAX_BYTES:
            packed_xy = _stack_xy(packed, dims, xy_radius)
        else:
            xy_radius = 0
    return DenseGrid(table=table, packed=packed, overflow=overflow,
                     packed_xy=packed_xy, dims=dims, stride=s,
                     xy_radius=xy_radius)


def _pack_z(table2d: jnp.ndarray) -> jnp.ndarray:
    """Rank+mask encode the z-window -2..+2 of a (R, Zp) table (see
    DenseGrid.packed): one int32 ``(rank0 + 1) << 5 | mask`` per slot.

    Shifts stay within each z-row (fill -1), so window reads never leak
    across (b, x, y) rows.
    """
    mask = None
    rank0 = None
    for i, dz in enumerate(range(-Z_PAD, Z_PAD + 1)):
        if dz < 0:
            sh = jnp.pad(table2d[:, :dz], ((0, 0), (-dz, 0)), constant_values=-1)
        elif dz > 0:
            sh = jnp.pad(table2d[:, dz:], ((0, 0), (0, dz)), constant_values=-1)
        else:
            sh = table2d
        sh = sh.reshape(-1)
        present = (sh >= 0).astype(jnp.int32)
        bit = present << i
        mask = bit if mask is None else mask | bit
        # first present entry wins the rank slot
        r = jnp.where(present > 0, sh, jnp.int32(2**30))
        rank0 = r if rank0 is None else jnp.minimum(rank0, r)
    rank0 = jnp.where(mask > 0, rank0, -1)
    return ((rank0 + 1) << 5) | mask


def _unpack_z(win: jnp.ndarray, cols) -> list:
    """Decode packed z-window values at the static ``cols`` (kz,) offsets
    -> list of (Q,) row-id arrays (-1 = missing)."""
    mask = win & 31
    rank0 = (win >> 5) - 1
    # popcount of mask bits strictly below each column, unrolled (5 bits)
    below = []
    for c in cols:
        c = int(c)
        pc = jnp.zeros_like(mask)
        for b in range(c):
            pc = pc + ((mask >> b) & 1)
        hit = (mask >> c) & 1
        below.append(jnp.where(hit > 0, rank0 + pc, -1))
    return below


def grid_lookup(grid: DenseGrid, coords4: jnp.ndarray, qvalid: jnp.ndarray):
    """coords4 (Q, 4) raw coordinates -> (idx, found). One scalar gather."""
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
    zp = grid.dims[3] + 2 * Z_PAD
    row = (b * dims[1] + q[:, 0]) * dims[2] + q[:, 1]
    flat = jnp.where(ok, row * zp + q[:, 2] + Z_PAD, 0)
    tbl = grid.table.reshape(-1)
    val = jnp.take(tbl, flat, axis=0, mode="clip")
    found = ok & (val >= 0)
    return jnp.where(found, val, 0).astype(jnp.int32), found


def _group_offsets(offs: np.ndarray, stride: int):
    """Static split of dz-fastest hypercube offsets into (dx,dy) groups.

    Returns (groups (K2, kz, 3) in table units, packed-column indices (kz,)).
    """
    offs_t = np.asarray(offs) // stride
    K = offs_t.shape[0]
    kz = len(set(offs_t[:, 2].tolist()))
    K2 = K // kz
    groups = offs_t.reshape(K2, kz, 3)
    assert all(
        (groups[:, 0, :2] == groups[:, j, :2]).all() for j in range(kz)
    ), "offsets not dz-fastest"
    dz = groups[0, :, 2]
    assert (np.diff(dz) == 1).all(), "dz offsets not contiguous"
    cols = dz + Z_PAD
    assert cols.min() >= 0 and cols.max() <= 2 * Z_PAD, "kernel z reach > Z_PAD"
    return groups, cols


def grid_offsets_lookup(
    grid: DenseGrid,
    coords4: jnp.ndarray,  # (M, 4) out-voxel coords (absolute units)
    valid: jnp.ndarray,  # (M,) bool
    offs: np.ndarray,  # (K, 3) static offsets, absolute units (stride-aligned)
) -> jnp.ndarray:
    """(M, K) input-row table: ONE row gather of the z-packed table per
    (out voxel, dx, dy) group fetches all dz offsets at once.

    Gathers here are op-count-bound (~4-8 ns each regardless of width), so
    fetching 5 int32 per op instead of 1 is ~5x cheaper than scalar lookups.
    NOTE: a windowed lax.gather (slice_sizes=(1, k)) looks equivalent but
    lowers catastrophically on TPU (>1000x slower); jnp.take of rows from a
    pre-stacked shift table is the fast formulation.
    """
    s = grid.stride
    dims = grid.dims
    nrows = dims[0] * dims[1] * dims[2]
    zp = dims[3] + 2 * Z_PAD
    groups, cols = _group_offsets(offs, s)
    m = coords4.shape[0]
    b = coords4[:, 0]
    qx = coords4[:, 1] // s
    qy = coords4[:, 2] // s
    qz = coords4[:, 3] // s
    base_ok = valid & (b >= 0) & (b < dims[0]) & (qz >= 0) & (qz < dims[3])
    r = grid.xy_radius
    if grid.packed_xy is not None and int(np.abs(groups[:, 0, :2]).max()) <= r:
        # xy-stacked fast path: ONE row gather per out voxel fetches the
        # packed z-windows of every (dx, dy) group (border shifts hold 0 =
        # "no voxels"), then the same pure-VPU rank+mask decode.
        side = 2 * r + 1
        colidx = (groups[:, 0, 0] + r) * side + (groups[:, 0, 1] + r)
        in_xy = (qx >= 0) & (qx < dims[1]) & (qy >= 0) & (qy < dims[2])
        row = (b * dims[1] + qx) * dims[2] + qy
        flat = jnp.where(
            base_ok & in_xy, row * zp + qz + Z_PAD, nrows * zp
        )
        rows_g = jnp.take(grid.packed_xy, flat, axis=0)  # (M, side^2)
        win = rows_g[:, colidx].reshape(-1)  # (M*K2,) groups-fastest
    else:
        ox = qx[:, None] + groups[None, :, 0, 0]  # (M, K2)
        oy = qy[:, None] + groups[None, :, 0, 1]
        ok = (
            base_ok[:, None]
            & (ox >= 0) & (ox < dims[1])
            & (oy >= 0) & (oy < dims[2])
        )
        flat = ((b[:, None] * dims[1] + ox) * dims[2] + oy) * zp + qz[:, None] + Z_PAD
        flat = jnp.where(ok, flat, (nrows + 1) * zp - 1)  # dummy slot -> all -1
        # ONE 1-lane gather per (out voxel, dx, dy) group, then a pure-VPU
        # rank+mask decode (see DenseGrid.packed).  1-lane gathers from big
        # tables run ~2x faster than 5-lane stacked rows (measured).
        win = jnp.take(grid.packed, flat.reshape(-1), axis=0)  # (M*K2,)
    entries = _unpack_z(win, cols)  # kz x (M*K2,)
    out = jnp.stack(entries, axis=1)  # (M*K2, kz)
    return out.reshape(m, groups.shape[0] * groups.shape[1])  # (M, K)


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
    # rank+mask window encoding of ``table`` (see DenseGrid.packed): slot s
    # holds (rank0+1)<<5 | mask over flat slots [s-2, s+2].  Lossless: local
    # rows follow main-rank order within one pid (local voxels are a subset
    # of main voxels sorted by the same spatial key), so present entries of
    # a flat window hold consecutive local rows.
    packed: jnp.ndarray  # (pid_cap * main_cap + 1,) int32
    pid_batch: jnp.ndarray  # (pid_cap,) int32 scene-batch of each proposal
    overflow: jnp.ndarray  # () int32 local voxels absent from the main level
    # (local_cap,) int32 main-level rank of each local row (-1 absent/invalid)
    # — lets kernel maps be DERIVED from the main topology's maps (one row
    # gather of the main map replaces the whole spatial lookup)
    g_of_row: jnp.ndarray = None
    pid_cap: int = flax.struct.field(pytree_node=False, default=0)
    main_cap: int = flax.struct.field(pytree_node=False, default=0)

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

    def offsets_spatial(self, coords4, valid, offs):
        """Spatial half of offsets_lookup only (latency attribution)."""
        pid = coords4[:, 0]
        ok = valid & (pid >= 0) & (pid < self.pid_cap)
        b = jnp.take(self.pid_batch, jnp.clip(pid, 0, self.pid_cap - 1))
        sc = jnp.concatenate([b[:, None], coords4[:, 1:]], axis=1)
        return grid_offsets_lookup(self.spatial, sc, ok, offs)

    def offsets_lookup(self, coords4, valid, offs):
        """Composite per-offset lookup: spatial grid -> pid table."""
        pid = coords4[:, 0]
        ok = valid & (pid >= 0) & (pid < self.pid_cap)
        b = jnp.take(self.pid_batch, jnp.clip(pid, 0, self.pid_cap - 1))
        sc = jnp.concatenate([b[:, None], coords4[:, 1:]], axis=1)
        g = grid_offsets_lookup(self.spatial, sc, ok, offs)  # (M, K) ranks
        groups, _ = _group_offsets(offs, self.spatial.stride)
        return self.translate(pid, g, groups.shape[1])

    def translate(self, pid, g, kz):
        """Main-rank entries -> local rows via the pid table.

        ``g``: (M, K) main-level ranks (-1 missing), dz-fastest offset layout
        with z-runs of length ``kz``.  Pays one gather per (out, dx, dy)
        group: spatial ranks of consecutive-z occupied voxels are CONSECUTIVE
        (rank order = key order and nothing sorts between them), so the
        group's pid-table entries live at anchor-2..anchor+2 of the flat
        table — gathered as one row of a shift-stacked view and aligned per
        slot by the rank delta (a 5-way select, pure VPU).
        """
        m, K = g.shape
        k2 = K // kz
        # TRANSPOSED layout (kz, m*k2): with the big dim minor, every
        # elementwise/reduce op below runs at full 128-lane occupancy.  The
        # (m*k2, kz) layout keeps a kz(=5)-lane minor dim — ~4% of each VPU
        # tile used.  Two relayout copies (in/out) cost ~0.1 ms; the decode
        # itself is tens of ops over millions of elements.
        gt = g.reshape(m * k2, kz).T  # (kz, m*k2)
        present = gt >= 0
        any_p = jnp.any(present, axis=0)  # (m*k2,)
        gmin = jnp.min(jnp.where(present, gt, np.int32(2**31 - 1)), axis=0)
        gmax = jnp.max(jnp.where(present, gt, -1), axis=0)
        anchor = (gmin + gmax) // 2  # always a present rank (consecutive run)
        size = self.pid_cap * self.main_cap
        pid_r = jnp.repeat(pid, k2, total_repeat_length=m * k2)
        base = jnp.where(any_p, pid_r * self.main_cap + anchor, size)
        # ONE 1-lane gather of the rank+mask packed table per group, then a
        # pure-VPU decode at each slot's dynamic window position.  (Measured:
        # a static-shift 5-way-select variant of this decode was 35 ms SLOWER
        # end to end — dynamic VPU shifts are not the problem.)
        win = jnp.take(self.packed, jnp.minimum(base, size), axis=0)
        mask = win & 31
        rank0 = (win >> 5) - 1
        delta = jnp.clip(gt - anchor[None, :], -Z_PAD, Z_PAD)  # (kz, m*k2)
        rows_out = []
        for ti in range(kz):
            c = delta[ti] + Z_PAD  # dynamic bit index in [0, 5); 1-D slice
            hit = present[ti] & (((mask >> c) & 1) > 0)
            below = mask & ((jnp.int32(1) << c) - 1)
            pc = jnp.zeros_like(mask)
            for b2 in range(2 * Z_PAD + 1):
                pc = pc + ((below >> b2) & 1)
            rows_out.append(jnp.where(hit, rank0 + pc, -1))
        row = jnp.stack(rows_out, axis=0)  # (kz, m*k2)
        return row.T.reshape(m, k2 * kz)


def build_pid_grid(level: SparseLevel, main_level: SparseLevel,
                   extent_or_grid, pid_batch: jnp.ndarray,
                   pid_cap: int) -> PidGrid:
    """Build the composite grid for a per-proposal level.

    ``main_level``: the main-scene level at the same stride; ``pid_batch``:
    proposal -> scene-batch map.  ``extent_or_grid`` is either the static
    extent tuple or an already-built main-level DenseGrid (reuse — grids are
    expensive enough to build only once per forward).
    """
    if isinstance(extent_or_grid, DenseGrid):
        spatial = extent_or_grid
    else:
        spatial = build_grid(main_level, extent_or_grid)
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
    # rank+mask window encoding (see PidGrid.packed)
    ext = jnp.concatenate([
        jnp.full((Z_PAD,), -1, jnp.int32), table,
        jnp.full((Z_PAD,), -1, jnp.int32),
    ])
    mask = None
    rank0 = None
    for i in range(2 * Z_PAD + 1):
        sh = jax.lax.dynamic_slice_in_dim(ext, i, size)
        present = (sh >= 0).astype(jnp.int32)
        bit = present << i
        mask = bit if mask is None else mask | bit
        r = jnp.where(present > 0, sh, jnp.int32(2**30))
        rank0 = r if rank0 is None else jnp.minimum(rank0, r)
    rank0 = jnp.where(mask > 0, rank0, -1)
    packed = jnp.concatenate([
        ((rank0 + 1) << 5) | mask, jnp.zeros((1,), jnp.int32)
    ])
    overflow = jnp.sum((level.valid & ~okf).astype(jnp.int32))
    return PidGrid(spatial=spatial, table=table, packed=packed,
                   pid_batch=pid_batch, overflow=overflow,
                   g_of_row=jnp.where(okf, g, -1).astype(jnp.int32),
                   pid_cap=pid_cap, main_cap=main_cap)


def _take_km_rows(main_km: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Row-gather of a main kernel map at main ranks ``g`` (-1 -> all -1)."""
    rows = jnp.take(
        main_km, jnp.clip(g, 0, main_km.shape[0] - 1), axis=0
    )
    return jnp.where((g >= 0)[:, None], rows, -1)


def build_pid_unet_topology(
    level0: SparseLevel,
    caps: Sequence[int],
    main_topo: "UNetTopology",
    pid_batch: jnp.ndarray,
    pid_cap: int,
    num_levels: int | None = None,
    stem_k: int = 5,
    parts: str = "all",
) -> UNetTopology:
    """Per-proposal topology whose kernel maps are DERIVED from the main
    scene's maps instead of looked up spatially.

    Local voxels are (pid, main voxel) pairs on the SAME lattice, so the
    input voxel of local output ``i`` at offset ``k`` is the pid-translation
    of ``main_km[g_i, k]`` (``g_i`` = main rank of local row ``i``, computed
    once per level while building the pid tables).  One (<=128-lane) row
    gather of the main map per local voxel replaces the whole spatial
    z-window lookup; only the pid-table translate remains.  Exactness: the
    main map answers exactly the query coordinates the spatial lookup would
    probe, and local pyramid levels are subsets of main pyramid levels
    (floor-division of a subset is a subset).
    """
    if num_levels is None:
        num_levels = len(caps)
    levels = [level0]
    for l in range(1, num_levels):
        levels.append(downsample(levels[-1], 2, caps[l]))
    grids = [
        build_pid_grid(lv, main_topo.levels[l], main_topo.grids[l],
                       pid_batch, pid_cap)
        for l, lv in enumerate(levels)
    ]
    level_overflow = sum(jnp.maximum(lv.count - lv.cap, 0) for lv in levels)
    grid_overflow = sum(g.overflow for g in grids)
    empty = jnp.zeros((0, 1), jnp.int32)

    def partial(stem_map=empty, k3=(), down=(), up=()):
        return UNetTopology(
            levels=tuple(levels), stem_map=stem_map, k3_maps=tuple(k3),
            down_maps=tuple(down), up_maps=tuple(up), grids=tuple(grids),
            level_overflow=jnp.int32(level_overflow),
            grid_overflow=jnp.int32(grid_overflow),
        )

    pids = [lv.coords[:, 0] for lv in levels]
    if parts == "pyramid":
        return partial()
    stem = grids[0].translate(
        pids[0], _take_km_rows(main_topo.stem_map, grids[0].g_of_row),
        kz=stem_k,
    )
    if parts == "stem":
        return partial(stem)
    if stem_k == 5:
        offs5 = [tuple(o) for o in kernel_offsets(5)]
        sel = np.array([offs5.index(tuple(o)) for o in kernel_offsets(3)])
        k3_0 = stem[:, sel]
    else:
        k3_0 = grids[0].translate(
            pids[0], _take_km_rows(main_topo.k3_maps[0], grids[0].g_of_row), 3
        )
    k3 = (k3_0,) + tuple(
        grids[l].translate(
            pids[l], _take_km_rows(main_topo.k3_maps[l], grids[l].g_of_row), 3
        )
        for l in range(1, num_levels)
    )
    if parts == "k3":
        return partial(stem, k3)
    down = tuple(
        grids[l].translate(
            pids[l + 1],
            _take_km_rows(main_topo.down_maps[l], grids[l + 1].g_of_row), 2
        )
        for l in range(num_levels - 1)
    )
    if parts == "down":
        return partial(stem, k3, down)
    up = tuple(
        up_map_direct(levels[l], grids[l + 1])
        for l in range(num_levels - 1)
    )
    return partial(stem, k3, down, up)


def conv_map(
    out_level: SparseLevel, in_level: SparseLevel, k: int,
    grid=None,
) -> jnp.ndarray:
    """Kernel map for a (possibly strided) convolution.

    Input voxel for output ``o`` and offset ``d`` sits at ``o + d * ts_in``.
    Covers stride-1 convs (out_level is in_level) and strided convs
    (out_level is the downsampled level).  For transposed convs use
    :func:`invert_map` on the forward strided map.

    With a grid, each offset is one scalar gather with base+delta index
    arithmetic; without one, a binary-search lookup per offset.

    Returns (M_out, K^3) int32 indices into in_level rows, -1 = missing.
    """
    if grid is not None:
        offs = kernel_offsets(k) * in_level.stride
        if isinstance(grid, PidGrid):
            return grid.offsets_lookup(out_level.coords, out_level.valid, offs)
        return grid_offsets_lookup(grid, out_level.coords, out_level.valid, offs)
    offs = kernel_offsets(k) * in_level.stride
    return _lookup_offsets(out_level, in_level, offs)


def conv_transpose_map(
    out_level: SparseLevel, in_level: SparseLevel, k: int,
    grid=None,
) -> jnp.ndarray:
    """Kernel map for a transposed convolution (coarse -> cached fine level).

    Offset ``d`` (in fine-stride units) contributes ``in[fine - d*ts_fine]``;
    the weight at index ``d`` is the same one the forward strided conv would
    use for ``fine = coarse + d*ts_fine``.  Prefer :func:`invert_map` of the
    forward map (pure scatters); this direct lookup is the fallback when no
    forward map exists.
    """
    del grid  # misaligned queries cannot use z-windows; binary search only
    offs = -kernel_offsets(k) * out_level.stride
    return _lookup_offsets(out_level, in_level, offs)


def up_map_direct(fine_level: SparseLevel, coarse_grid) -> jnp.ndarray:
    """Transpose-conv (k=2 s=2) kernel map WITHOUT scatters.

    Each fine voxel ``j`` is read by EXACTLY ONE (coarse output, offset)
    pair: the coarse parent ``floor(c_j / 2ts) * 2ts`` at offset
    ``d = (c_j - parent) / ts`` (dz-fastest index ``4dx + 2dy + dz``).  One
    grid lookup of the parent rank + an elementwise 8-way select replaces
    ``invert_map``'s 8 column scatters — identical output (equality-tested
    against invert_map in tests/test_core.py).
    """
    ts = fine_level.stride
    c = fine_level.coords
    parent_sp = (c[:, 1:] // (2 * ts)) * (2 * ts)
    parent = jnp.concatenate([c[:, :1], parent_sp], axis=1)
    g, found = coarse_grid.lookup(parent, fine_level.valid)
    d = (c[:, 1:] - parent_sp) // ts  # each component in {0, 1}
    kj = d[:, 0] * 4 + d[:, 1] * 2 + d[:, 2]  # dz-fastest offset index
    k_idx = jnp.arange(8, dtype=jnp.int32)
    return jnp.where(
        (k_idx[None, :] == kj[:, None]) & found[:, None], g[:, None], -1
    ).astype(jnp.int32)


def invert_map(kmap: jnp.ndarray, in_cap: int) -> jnp.ndarray:
    """Invert a kernel map: ``out[j, k] = i  <=>  kmap[i, k] = j``.

    The transpose-conv map is exactly the inverse of the forward strided-conv
    map (same offset enumeration), so K column scatters replace K*M lookups.
    Prefer :func:`up_map_direct` when a coarse-level grid exists (pure
    gather + select, no scatters).
    """
    K = kmap.shape[1]
    m = kmap.shape[0]
    rows = jnp.arange(m, dtype=jnp.int32)
    cols = []
    for kk in range(K):
        j = kmap[:, kk]
        col = jnp.full((in_cap + 1,), -1, jnp.int32).at[
            jnp.where(j >= 0, j, in_cap)
        ].set(jnp.where(j >= 0, rows, -1))[:in_cap]
        cols.append(col)
    return jnp.stack(cols, axis=1)  # (in_cap, K)


def _lookup_offsets(
    out_level: SparseLevel, in_level: SparseLevel, offs: np.ndarray,
) -> jnp.ndarray:
    """Binary-search fallback used when no dense grid is available."""
    m = out_level.cap
    K = offs.shape[0]
    base = out_level.coords  # (M, 4)
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
    # per-level lookup grids (DenseGrid/PidGrid or None); reused by callers
    # for the voxel->point map and the per-proposal composite grids
    grids: tuple = ()
    # () int32 diagnostics: voxels beyond level caps / outside grid extents
    level_overflow: jnp.ndarray = 0
    grid_overflow: jnp.ndarray = 0
    # banded one-hot conv plans (nn/onehot_conv.attach_plans); entries are
    # OnehotPlan or None, aligned with k3_maps/down_maps/up_maps (the k=5
    # stem cannot band — its 125-offset window is wider than any usable span)
    k3_plans: tuple = ()
    down_plans: tuple = ()
    up_plans: tuple = ()
    plan_overflow: jnp.ndarray = 0  # () int32 map entries outside their band


def build_unet_topology(
    level0: SparseLevel,
    caps: Sequence[int],
    num_levels: int | None = None,
    stem_k: int = 5,
    extent: "tuple | None" = None,
    grids=None,
    parts: str = "all",
) -> UNetTopology:
    """Build the full coordinate pyramid + kernel maps for a MinkUNet.

    ``caps[l]`` is the static voxel capacity of level ``l`` (caps[0] must
    equal level0.cap).  Kernel maps at equal stride are built once and shared
    by every residual block at that stride — the kernel-map reuse that drives
    sparse-conv throughput.

    ``extent`` (B, X, Y, Z): when given, per-level dense occupancy grids are
    built once and all kernel maps use z-window gathers (see module
    docstring).  ``grids`` may instead supply prebuilt grids (list) or a
    callable ``level -> grid``.  Without either, binary search (slow).

    ``parts`` truncates the build for latency attribution (profiling only):
    "pyramid" stops after levels+grids, then cumulatively "stem", "k3",
    "down"; "all" (production) also builds the transpose (up) maps.
    """
    if num_levels is None:
        num_levels = len(caps)
    levels = [level0]
    for l in range(1, num_levels):
        levels.append(downsample(levels[-1], 2, caps[l]))
    if grids is None:
        # xy-stack radius: 2 covers the k=5 stem at level 0; 1 covers the
        # k=3 / k=2 maps everywhere else.  The stack's WIN scales with the
        # voxel cap (gather-op count) while its build cost scales with grid
        # slots, so small levels skip it — at toy caps (tests, the multichip
        # dryrun) a multi-hundred-MB stack per device is pure overhead.
        grids = [
            build_grid(
                lv, extent,
                xy_radius=(2 if (l == 0 and stem_k == 5) else 1)
                if lv.cap >= 16384 else 0,
            )
            if extent is not None else None
            for l, lv in enumerate(levels)
        ]
    elif callable(grids):
        grids = [grids(lv) for lv in levels]
    level_overflow = sum(
        jnp.maximum(lv.count - lv.cap, 0) for lv in levels
    )
    grid_overflow = sum(
        (g.overflow if g is not None else jnp.int32(0)) for g in grids
    )
    empty = jnp.zeros((0, 1), jnp.int32)

    def partial(stem_map=empty, k3=(), down=(), up=()):
        return UNetTopology(
            levels=tuple(levels), stem_map=stem_map, k3_maps=tuple(k3),
            down_maps=tuple(down), up_maps=tuple(up), grids=tuple(grids),
            level_overflow=jnp.int32(level_overflow),
            grid_overflow=jnp.int32(grid_overflow),
        )

    if parts == "pyramid":
        return partial()
    if parts == "stemsp":
        # spatial half of the stem lookup only (PidGrid latency attribution)
        g0 = grids[0]
        offs = kernel_offsets(stem_k) * levels[0].stride
        if isinstance(g0, PidGrid):
            return partial(g0.offsets_spatial(
                levels[0].coords, levels[0].valid, offs
            ))
        return partial(grid_offsets_lookup(
            g0, levels[0].coords, levels[0].valid, offs
        ))
    stem = conv_map(levels[0], levels[0], stem_k, grids[0])
    if parts == "stem":
        return partial(stem)
    if stem_k == 5:
        # the 27 k=3 offsets are a subset of the 125 k=5 stem offsets at the
        # same (out=in) level: slice columns instead of re-looking-up
        offs5 = [tuple(o) for o in kernel_offsets(5)]
        sel = np.array([offs5.index(tuple(o)) for o in kernel_offsets(3)])
        k3_0 = stem[:, sel]
    else:
        k3_0 = conv_map(levels[0], levels[0], 3, grids[0])
    k3 = (k3_0,) + tuple(
        conv_map(lv, lv, 3, g)
        for lv, g in zip(levels[1:], grids[1:])
    )
    if parts == "k3":
        return partial(stem, k3)
    down = tuple(
        conv_map(levels[l + 1], levels[l], 2, grids[l])
        for l in range(num_levels - 1)
    )
    if parts == "down":
        return partial(stem, k3, down)
    up = tuple(
        up_map_direct(levels[l], grids[l + 1])
        if grids[l + 1] is not None
        else invert_map(down[l], levels[l].cap)
        for l in range(num_levels - 1)
    )
    return partial(stem, k3, down, up)
