"""PidGrid.translate internals: what do the window gather vs the rank+mask
decode cost?  Sizes the optimization headroom of the topo2 stem/down
translates (round-5 attribution: stem translate ~17.5 ms of the 40 ms topo2
stage).

Builds the real bench-scene main topology + a synthetic 14-proposal pid
table at L0 (local voxels = fg voxels, mirroring the oracle bench content),
then times:
  1. full stem translate (production path)
  2. window gather only (the 1-lane packed-table gather, decode skipped)
  3. decode only (gather replaced by a precomputed win array)
Run on the TPU: python perf/micro_translate.py
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
xyz, sem_gt, ins_gt, obj_centers = make_scene(rng)
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


@jax.jit
def build(coords, feats0, valid):
    level0, feats = make_level0(coords, feats0, valid)
    return tp.build_unet_topology(
        level0, list(shapes.voxel_caps), extent=shapes.grid_extent
    )


topo = build(coords, feats0, valid)

# synthetic local level: voxels of object points (sem>=2), pid = instance id
# clipped to cluster_cap, padded to local cap — same shape class as the
# oracle bench run (local_vox ~ 41.5k)
vox_sem = np.full(m, -1, np.int32)
vox_ins = np.full(m, -100, np.int32)
vox_sem[:] = sem_gt[index]
vox_ins[:] = ins_gt[index]
is_obj = vox_sem >= 2
lc = np.concatenate(
    [np.clip(vox_ins[is_obj], 0, 127)[:, None].astype(np.int32),
     vox[is_obj]], 1
)
order = np.lexsort((lc[:, 3], lc[:, 2], lc[:, 1], lc[:, 0]))
lc = lc[order]
NL = shapes.local_voxel_caps[0]
print(f"local voxels: {lc.shape[0]} / cap {NL}", file=sys.stderr)
lc_p = pad(lc, NL)
lvalid = jnp.asarray(np.arange(NL) < lc.shape[0])
lv2 = tp.level_from_coords(jnp.asarray(lc_p), lvalid, NL, 1)
pid_batch = jnp.zeros((128,), jnp.int32)


def build_grid(lv2, main_level, main_grid, pid_batch):
    return tp.build_pid_grid(lv2, main_level, main_grid, pid_batch, 128)


# pass all big arrays as ARGUMENTS: closure-captured consts get serialized
# into the remote-compile request and blow its size limit (HTTP 413)
grid = jax.jit(build_grid)(lv2, topo.levels[0], topo.grids[0], pid_batch)
jax.block_until_ready(grid.packed)
print("grid built", file=sys.stderr)

pids = lv2.coords[:, 0]
stem_map = topo.stem_map


def timeit(name, fn, args, iters=20):
    f = jax.jit(fn)
    t0 = time.time()
    _ = float(f(*args, 2))
    print(f"  [{name} compile {time.time()-t0:.0f}s]", flush=True)
    t0 = time.time()
    _ = float(f(*args, iters))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def full_translate(grid, stem_map, pids, r):
    def body(_, acc):
        g = tp._take_km_rows(stem_map, grid.g_of_row)
        out = grid.translate(pids, g + (acc * 0).astype(jnp.int32), kz=5)
        return jnp.sum(out.astype(jnp.float32) * 1e-6)
    return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))


def km_rows_only(grid, stem_map, pids, r):
    def body(_, acc):
        g = tp._take_km_rows(stem_map, grid.g_of_row + (acc * 0).astype(jnp.int32))
        return jnp.sum(g.astype(jnp.float32) * 1e-6)
    return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))


def window_gather_only(grid, stem_map, pids, r):
    mm, K = stem_map.shape[0], stem_map.shape[1]
    kz = 5

    def body(_, acc):
        g = tp._take_km_rows(stem_map, grid.g_of_row + (acc * 0).astype(jnp.int32))
        m2, K2 = g.shape
        k2 = K2 // kz
        gt = g.reshape(m2 * k2, kz).T
        present = gt >= 0
        any_p = jnp.any(present, axis=0)
        gmin = jnp.min(jnp.where(present, gt, np.int32(2**31 - 1)), axis=0)
        gmax = jnp.max(jnp.where(present, gt, -1), axis=0)
        anchor = (gmin + gmax) // 2
        size = grid.pid_cap * grid.main_cap
        pid_r = jnp.repeat(pids, k2, total_repeat_length=m2 * k2)
        base = jnp.where(any_p, pid_r * grid.main_cap + anchor, size)
        win = jnp.take(grid.packed, jnp.minimum(base, size), axis=0)
        return jnp.sum(win.astype(jnp.float32) * 1e-9)
    return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))


args = (grid, stem_map, pids)
t_full = timeit("stem translate full", full_translate, args)
t_km = timeit("_take_km_rows only", km_rows_only, args)
t_gather = timeit("anchor+window gather only", window_gather_only, args)
print(f"decode-only estimate: {t_full - t_gather:.2f} ms", flush=True)
print("DONE", flush=True)


def anchor_only(grid, stem_map, pids, r):
    """Anchor/index prep WITHOUT the packed-table gather."""
    kz = 5

    def body(_, acc):
        g = tp._take_km_rows(stem_map, grid.g_of_row + (acc * 0).astype(jnp.int32))
        m2, K2 = g.shape
        k2 = K2 // kz
        gt = g.reshape(m2 * k2, kz).T
        present = gt >= 0
        any_p = jnp.any(present, axis=0)
        gmin = jnp.min(jnp.where(present, gt, np.int32(2**31 - 1)), axis=0)
        gmax = jnp.max(jnp.where(present, gt, -1), axis=0)
        anchor = (gmin + gmax) // 2
        size = grid.pid_cap * grid.main_cap
        pid_r = jnp.repeat(pids, k2, total_repeat_length=m2 * k2)
        base = jnp.where(any_p, pid_r * grid.main_cap + anchor, size)
        return jnp.sum(base.astype(jnp.float32) * 1e-9)
    return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))


t_anchor = timeit("anchor prep only (no gather)", anchor_only, args)
print(f"pure win gather estimate: {t_gather - t_anchor:.2f} ms", flush=True)
print("DONE2", flush=True)
