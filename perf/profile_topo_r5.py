"""Phase-level latency attribution: clustering internals + main-topology
build parts, on the bench scene content (oracle offsets)."""
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
from pbnet_tpu.models.pbnet import make_level0, COUNT_MEAN
from pbnet_tpu.ops import cluster as cl

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
n, m = xyz.shape[0], vox.shape[0]
P, V = shapes.point_cap, shapes.voxel_caps[0]


def pad(a, cap, fill=0):
    out = np.full((cap,) + a.shape[1:], fill, a.dtype)
    out[: a.shape[0]] = a
    return out


coords = jnp.asarray(pad(np.concatenate([np.zeros((m, 1), np.int32), vox], 1), V))
feats0 = jnp.asarray(pad(rng.randn(m, 6).astype(np.float32) * 0.1, V))
vvalid = jnp.asarray(np.arange(V) < m)

# fg-compacted cluster inputs (oracle offsets, mirrors instance_stage)
sem_o = pad(sem_gt.astype(np.int32), P, -1)
center_of = np.zeros((P, 3), np.float32)
has_ins = ins_gt >= 0
center_of[:n][has_ins] = obj_centers[ins_gt[has_ins]]
offs_o = np.zeros((P, 3), np.float32)
offs_o[:n][has_ins] = center_of[:n][has_ins] - xyz[has_ins]
xyz_p = pad(xyz, P)
fg = (sem_o >= 2)
NF = shapes.fg_point_cap
sel = np.argsort(np.where(fg, 0, 1), kind="stable")[:NF]
live = fg[sel]
shifted_f = jnp.asarray((xyz_p + offs_o)[sel])
orig_f = jnp.asarray(xyz_p[sel])
sem_f = jnp.asarray(sem_o[sel])
batch_f = jnp.zeros((NF,), jnp.int32)
live_f = jnp.asarray(live)
cm = jnp.asarray(COUNT_MEAN)
print(f"fg rows: {int(live.sum())}/{NF}", flush=True)


def timeit(name, make_fn, iters=10):
    f = jax.jit(make_fn)
    t0 = time.time()
    _ = float(f(2))
    print(f"  [{name} compile {time.time()-t0:.0f}s]", flush=True)
    t0 = time.time()
    _ = float(f(iters))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt



def topo_part(parts):
    def fn(r):
        def body(_, acc):
            level0, _f = make_level0(coords, feats0 + acc * 1e-30, vvalid)
            t = tp.build_unet_topology(
                level0, list(shapes.voxel_caps), extent=shapes.grid_extent,
                parts=parts,
            )
            d = sum(jnp.sum(lv.hi.astype(jnp.float32) * 1e-6) for lv in t.levels)
            d = d + sum(
                jnp.sum(g.packed.astype(jnp.float32) * 1e-9)
                for g in t.grids if g is not None
            )
            for km in (t.stem_map,) + t.k3_maps + t.down_maps + t.up_maps:
                d = d + jnp.sum(km.astype(jnp.float32) * 1e-6)
            return d
        return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))
    return fn


for parts in ("pyramid", "stem", "k3", "down", "all"):
    timeit(f"topo:{parts}", topo_part(parts))
print("DONE", flush=True)
