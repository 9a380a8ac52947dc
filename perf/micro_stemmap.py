"""Stem-map (L0 radius-2 window lookup) decomposition on the real topology.

profile_topo_r5: stem map build = +28.3 ms.  micro_gather_cliff: the raw
xy-stack row gather only accounts for ~5 ms.  This isolates the pieces of
grid_offsets_lookup: row gather | + column permutation | + rank/mask decode.

Run on the TPU: python perf/micro_stemmap.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import pbnet_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from pbnet_tpu.config import StaticShapes
from pbnet_tpu.core.quantize import sparse_quantize_np
from pbnet_tpu.core import topology as tp
from pbnet_tpu.models.pbnet import make_level0

from bench import make_scene

shapes = StaticShapes(
    point_cap=147_456,
    voxel_caps=(98_304, 45_056, 16_384, 6_144, 2_048),
    cluster_cap=128,
    local_point_cap=61_440,
    local_voxel_caps=(45_056, 22_528, 9_216, 4_608, 2_048),
    score_voxel_caps=(45_056, 22_528, 9_216, 4_608, 2_048),
    instance_cap=128,
    cluster_band=4_096,
    fg_point_cap=61_440,
    nn_exact_cap=1_024,
    grid_extent=(1, 256, 256, 160),
)
rng = np.random.RandomState(0)
xyz, *_ = make_scene(rng)
vox, index, _ = sparse_quantize_np(xyz, 0.02)
m = vox.shape[0]
V = shapes.voxel_caps[0]


def pad(a, cap, fill=0):
    out = np.full((cap,) + a.shape[1:], fill, a.dtype)
    out[: a.shape[0]] = a
    return out


coords = jnp.asarray(pad(np.concatenate([np.zeros((m, 1), np.int32), vox], 1), V))
feats0 = jnp.asarray(pad(rng.randn(m, 6).astype(np.float32) * 0.1, V))
valid = jnp.asarray(np.arange(V) < m)


def build(coords, feats0, valid):
    level0, _ = make_level0(coords, feats0, valid)
    topo = tp.build_unet_topology(
        level0, list(shapes.voxel_caps), extent=shapes.grid_extent,
        parts="pyramid",
    )
    return topo.levels[0], topo.grids[0]


lv0, grid0 = jax.jit(build)(coords, feats0, valid)
jax.block_until_ready(grid0.packed_xy)
print(f"grid ready: packed_xy {grid0.packed_xy.shape}", file=sys.stderr)

offs5 = tp.kernel_offsets(5)
groups, cols = tp._group_offsets(offs5, 1)
dims = grid0.dims
r = grid0.xy_radius
side = 2 * r + 1
colidx = (groups[:, 0, 0] + r) * side + (groups[:, 0, 1] + r)
print(f"colidx identity: {np.array_equal(np.asarray(colidx), np.arange(25))}",
      file=sys.stderr)
zp = dims[3] + 2 * tp.Z_PAD
nrows = dims[0] * dims[1] * dims[2]


def flat_of(c4, valid_q):
    b = c4[:, 0]
    qx, qy, qz = c4[:, 1], c4[:, 2], c4[:, 3]
    base_ok = valid_q & (qz >= 0) & (qz < dims[3])
    in_xy = (qx >= 0) & (qx < dims[1]) & (qy >= 0) & (qy < dims[2])
    row = (b * dims[1] + qx) * dims[2] + qy
    return jnp.where(base_ok & in_xy, row * zp + qz + tp.Z_PAD, nrows * zp)


def timeit(name, fn, args, iters=10):
    f = jax.jit(fn)
    t0 = time.time()
    _ = float(f(*args, 2))
    print(f"  [{name} compile {time.time()-t0:.0f}s]", flush=True)
    t0 = time.time()
    _ = float(f(*args, iters))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def full_lookup(grid0, lv0, r):
    def body(_, acc):
        km = tp.grid_offsets_lookup(
            grid0, lv0.coords + (acc * 0).astype(jnp.int32), lv0.valid, offs5
        )
        return jnp.sum(km.astype(jnp.float32) * 1e-6)
    return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))


def rowgather_only(grid0, lv0, r):
    def body(_, acc):
        flat = flat_of(lv0.coords + (acc * 0).astype(jnp.int32), lv0.valid)
        rows_g = jnp.take(grid0.packed_xy, flat, axis=0)
        return jnp.sum(rows_g.astype(jnp.float32) * 1e-9)
    return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))


def rowgather_perm(grid0, lv0, r):
    ci = jnp.asarray(colidx)

    def body(_, acc):
        flat = flat_of(lv0.coords + (acc * 0).astype(jnp.int32), lv0.valid)
        rows_g = jnp.take(grid0.packed_xy, flat, axis=0)
        win = rows_g[:, ci].reshape(-1)
        return jnp.sum(win.astype(jnp.float32) * 1e-9)
    return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))


def rowgather_decode(grid0, lv0, r):
    ci = jnp.asarray(colidx)

    def body(_, acc):
        flat = flat_of(lv0.coords + (acc * 0).astype(jnp.int32), lv0.valid)
        rows_g = jnp.take(grid0.packed_xy, flat, axis=0)
        win = rows_g[:, ci].reshape(-1)
        entries = tp._unpack_z(win, cols)
        out = jnp.stack(entries, axis=1)
        return jnp.sum(out.astype(jnp.float32) * 1e-6)
    return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))


args = (grid0, lv0)
timeit("full grid_offsets_lookup k5", full_lookup, args)
timeit("xy row gather only", rowgather_only, args)
timeit("row gather + col perm", rowgather_perm, args)
timeit("row gather + perm + decode", rowgather_decode, args)
print("DONE", flush=True)


def stack_build(grid0, lv0, r):
    """_stack_xy build cost (the 1.06 GB shifted-copy table)."""
    def body(_, acc):
        pk = grid0.packed + (acc * 0).astype(jnp.int32)
        st = tp._stack_xy(pk, dims, 2)
        return jnp.sum(st.astype(jnp.float32) * 1e-9)
    return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))


timeit("xy-stack build (radius 2)", stack_build, (grid0, lv0), iters=10)
print("DONE3", flush=True)


def stack_build_barrier(grid0, lv0, r):
    """(S, N) contiguous stack + FORCED transpose (optimization_barrier
    prevents XLA from canonicalizing transpose-of-stack back to the
    column-store form)."""
    B, X, Y, _ = dims
    zp_l = grid0.packed.shape[0] // (B * X * Y + 1)

    def body(_, acc):
        pk = grid0.packed + (acc * 0).astype(jnp.int32)
        p3 = pk[: B * X * Y * zp_l].reshape(B, X, Y, zp_l)
        shifts = []
        for dx in range(-2, 3):
            for dy in range(-2, 3):
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
        st0 = jnp.stack(shifts, axis=0)  # (25, N) contiguous writes
        st0 = jax.lax.optimization_barrier(st0)
        st = st0.T  # one tiled relayout
        return jnp.sum(st.astype(jnp.float32) * 1e-9)
    return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))


def stack_build_dwconv(grid0, lv0, r):
    """Depthwise-conv shift-stack: packed values < 2^23 are EXACT in f32;
    a 5x5 depthwise conv with one-hot kernels and channel multiplier 25
    writes the (N, 25) stack in one dense pass (channel order z*25+j =
    (z, j) minor-j, exactly the (N, 25) row layout)."""
    B, X, Y, _ = dims
    zp_l = grid0.packed.shape[0] // (B * X * Y + 1)
    # kernel: (5, 5, 1, zp*25) with feature_group_count=zp
    k = np.zeros((5, 5, 1, zp_l * 25), np.float32)
    j = 0
    for dx in range(-2, 3):
        for dy in range(-2, 3):
            # output channel z*25+j reads input channel z at spatial
            # offset (dx, dy): kernel position (2+dx? sign!) -- conv
            # correlation: out[x,y] = sum_k k[kx,ky] in[x+kx-2, y+ky-2]
            for z in range(zp_l):
                k[2 + dx, 2 + dy, 0, z * 25 + j] = 1.0
            j += 1
    kj = jnp.asarray(k)

    def body(_, acc):
        pk = grid0.packed + (acc * 0).astype(jnp.int32)
        p4 = pk[: B * X * Y * zp_l].astype(jnp.float32).reshape(B, X, Y, zp_l)
        y = jax.lax.conv_general_dilated(
            p4, kj, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=zp_l,
        )
        return jnp.sum(y * 1e-9)
    return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))


timeit("stack via barrier+transpose", stack_build_barrier, (grid0, lv0),
       iters=10)
timeit("stack via depthwise conv", stack_build_dwconv, (grid0, lv0), iters=10)
print("DONE4", flush=True)


def stack_blocked(grid0, lv0, r):
    """Z-blocked stack prototype: (R*zp/B2, S*B2) with B2=32.

    Build: per shift j a pure reshape of the shifted flat table -> concat
    along lanes in 32-lane (128 B) chunks — chunky writes instead of the
    4-byte column stores.  Query: ONE row gather (S*B2=800 lanes) at
    flat//B2, then per-group dynamic-lane select at flat%B2 (the SAME lane
    offset for every group).  Windows stay self-contained (each packed slot
    already encodes its own z-window), so z-block boundaries need no halo.
    """
    B, X, Y, _ = dims
    zp_l = grid0.packed.shape[0] // (B * X * Y + 1)
    N = B * X * Y * zp_l
    B2 = 32
    Rz = N // B2  # N divisible: zp=164, pad if needed (fine for micro)

    def body(_, acc):
        pk = grid0.packed + (acc * 0).astype(jnp.int32)
        p3 = pk[:N].reshape(B, X, Y, zp_l)
        blocks = []
        for dx in range(-2, 3):
            for dy in range(-2, 3):
                sh = p3
                if dx > 0:
                    sh = jnp.pad(sh[:, dx:], ((0, 0), (0, dx), (0, 0), (0, 0)))
                elif dx < 0:
                    sh = jnp.pad(sh[:, :dx], ((0, 0), (-dx, 0), (0, 0), (0, 0)))
                if dy > 0:
                    sh = jnp.pad(sh[:, :, dy:], ((0, 0), (0, 0), (0, dy), (0, 0)))
                elif dy < 0:
                    sh = jnp.pad(sh[:, :, :dy], ((0, 0), (0, 0), (-dy, 0), (0, 0)))
                blocks.append(sh.reshape(Rz, B2))
        st = jnp.concatenate(blocks, axis=1)  # (Rz, 25*B2)
        return jnp.sum(st.astype(jnp.float32) * 1e-9)
    return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))


def blocked_lookup(st, lv0, r):
    """Row gather + lane extract + decode from a prebuilt blocked stack."""
    B2 = 32

    def body(_, acc):
        flat = flat_of(lv0.coords + (acc * 0).astype(jnp.int32), lv0.valid)
        q = jnp.minimum(flat // B2, st.shape[0] - 1)
        lane = flat % B2
        rows_g = jnp.take(st, q, axis=0)  # (M, 25*B2)
        r3 = rows_g.reshape(-1, 25, B2)
        win25 = jnp.take_along_axis(
            r3, lane[:, None, None].astype(jnp.int32), axis=2
        )[:, :, 0]  # (M, 25)
        win = win25.reshape(-1)
        entries = tp._unpack_z(win, cols)
        out = jnp.stack(entries, axis=1)
        return jnp.sum(out.astype(jnp.float32) * 1e-6)
    return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))


timeit("blocked stack build B2=32", stack_blocked, (grid0, lv0), iters=10)
B, X, Y = dims[0], dims[1], dims[2]
zp_l = grid0.packed.shape[0] // (B * X * Y + 1)
N = B * X * Y * zp_l
p3 = grid0.packed[:N].reshape(B, X, Y, zp_l)
blocks = []
for dx in range(-2, 3):
    for dy in range(-2, 3):
        sh = p3
        if dx > 0:
            sh = jnp.pad(sh[:, dx:], ((0, 0), (0, dx), (0, 0), (0, 0)))
        elif dx < 0:
            sh = jnp.pad(sh[:, :dx], ((0, 0), (-dx, 0), (0, 0), (0, 0)))
        if dy > 0:
            sh = jnp.pad(sh[:, :, dy:], ((0, 0), (0, 0), (0, dy), (0, 0)))
        elif dy < 0:
            sh = jnp.pad(sh[:, :, :dy], ((0, 0), (0, 0), (-dy, 0), (0, 0)))
        blocks.append(sh.reshape(N // 32, 32))
st_pre = jnp.concatenate(blocks, axis=1)
jax.block_until_ready(st_pre)
timeit("blocked lookup (gather+extract+decode)", blocked_lookup,
       (st_pre, lv0), iters=10)
print("DONE5", flush=True)


def stack_onehot_bcast(grid0, lv0, r):
    """Stack build as a SUM of one-hot lane broadcasts: XLA fuses the 25
    selects into ONE contiguous pass over the (N, 25) output."""
    B, X, Y, _ = dims
    zp_l = grid0.packed.shape[0] // (B * X * Y + 1)
    N = B * X * Y * zp_l
    lanes = jnp.arange(25, dtype=jnp.int32)

    def body(_, acc):
        pk = grid0.packed + (acc * 0).astype(jnp.int32)
        p3 = pk[:N].reshape(B, X, Y, zp_l)
        out = jnp.zeros((N, 25), jnp.int32)
        j = 0
        for dx in range(-2, 3):
            for dy in range(-2, 3):
                sh = p3
                if dx > 0:
                    sh = jnp.pad(sh[:, dx:], ((0, 0), (0, dx), (0, 0), (0, 0)))
                elif dx < 0:
                    sh = jnp.pad(sh[:, :dx], ((0, 0), (-dx, 0), (0, 0), (0, 0)))
                if dy > 0:
                    sh = jnp.pad(sh[:, :, dy:], ((0, 0), (0, 0), (0, dy), (0, 0)))
                elif dy < 0:
                    sh = jnp.pad(sh[:, :, :dy], ((0, 0), (0, 0), (-dy, 0), (0, 0)))
                out = out + jnp.where(
                    (lanes == j)[None, :], sh.reshape(N, 1), 0
                )
                j += 1
        return jnp.sum(out.astype(jnp.float32) * 1e-9)
    return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))


timeit("stack via onehot broadcast sum", stack_onehot_bcast, (grid0, lv0),
       iters=10)
print("DONE6", flush=True)
