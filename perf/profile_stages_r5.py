"""Stage-level latency attribution of the full bench forward at the current
code (round 5).  Uses PBNet.instance_stage(stop_after=...) truncation points;
each stage is its own chained-fori_loop jit program (single digest fetch).

Deltas between successive stages give the per-stage cost:
  backbone | cluster | assemble | topo2(all) | mask(D_Unet) | proposal | full
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
from pbnet_tpu.models.pbnet import PBNet

from bench import make_scene

# kept in sync with bench.py's round-5 fitted shapes (2.06x configuration)
shapes = StaticShapes(
    point_cap=140_032,
    voxel_caps=(92_416, 39_424, 10_240, 4_096, 2_048),
    cluster_cap=16,
    local_point_cap=56_320,
    local_voxel_caps=(41_984, 20_992, 5_888, 1_536, 512),
    score_voxel_caps=(41_984, 20_992, 5_888, 1_536, 512),
    instance_cap=16,
    cluster_band=4_096,
    fg_point_cap=56_320,
    nn_exact_cap=1_024,
    grid_extent=(1, 240, 240, 136),
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


batch = {
    "vox_coords": pad(np.concatenate([np.zeros((m, 1), np.int32), vox], 1), V),
    "vox_feats": pad(rng.randn(m, 6).astype(np.float32) * 0.1, V),
    "vox_valid": np.arange(V) < m,
    "xyz": pad(xyz, P),
    "point_batch": np.zeros(P, np.int32),
    "point_valid": np.arange(P) < n,
}
batch = {k: jnp.asarray(v) for k, v in batch.items()}

model = PBNet(shapes=shapes)
init_fn = jax.jit(lambda key, b: model.init(
    key, b, with_instances=True, with_labels=False, train=False))
t0 = time.time()
variables = init_fn(jax.random.PRNGKey(0), batch)
jax.block_until_ready(variables)
print(f"init: {time.time()-t0:.0f}s", flush=True)

sem_o = pad(sem_gt.astype(np.int32), P, -1)
center_of = np.zeros((P, 3), np.float32)
has_ins = ins_gt >= 0
center_of[:n][has_ins] = obj_centers[ins_gt[has_ins]]
offs_o = np.zeros((P, 3), np.float32)
offs_o[:n][has_ins] = center_of[:n][has_ins] - xyz[has_ins]
soft_o = np.full((P, 20), 0.05, np.float32)
soft_o[np.arange(P), np.clip(sem_o, 0, 19)] = 0.9
oracle = tuple(jnp.asarray(a) for a in (sem_o, offs_o, soft_o))


def tree_digest(x):
    leaves = jax.tree_util.tree_leaves(x)
    d = jnp.float32(0.0)
    for lf in leaves:
        if lf.dtype == jnp.bool_:
            lf = lf.astype(jnp.int32)
        d = d + jnp.sum(lf.astype(jnp.float32) * 1e-6)
    return d


def stage_fn(stop):
    def fn(r):
        sem_oo, offs_oo, soft_oo = oracle

        def body(_, acc):
            b2 = dict(batch)
            b2["vox_feats"] = batch["vox_feats"] + acc * 1e-30
            bb = model.apply(variables, b2, False, method=PBNet.backbone)
            d_bb = (jnp.sum(bb["sem_pred_score_p"])
                    + jnp.sum(bb["offset_pred_p"]))
            if stop == "backbone":
                return d_bb
            bb = dict(bb)
            bb["sem_pred_p"] = sem_oo
            bb["offset_pred_p"] = offs_oo + acc * 1e-30
            bb["sem_soft_p"] = soft_oo
            ret = model.apply(variables, b2, bb, False, False, stop,
                              method=PBNet.instance_stage)
            return d_bb + tree_digest(ret)

        return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))
    return fn


STAGES = ["backbone", "cluster", "assemble", "topo2:all", "mask",
          "proposal", None]
if len(sys.argv) > 1:  # e.g. `python perf/profile_stages_r5.py backbone mask`
    STAGES = [None if a == "full" else a for a in sys.argv[1:]]
results = {}
for stop in STAGES:
    name = stop or "full"
    f = jax.jit(stage_fn(stop), static_argnums=())
    t0 = time.time()
    _ = float(f(2))
    print(f"  [{name} compile {time.time()-t0:.0f}s]", flush=True)
    t0 = time.time()
    _ = float(f(10))
    dt = (time.time() - t0) / 10 * 1e3
    results[name] = dt
    print(f"{name}: {dt:.1f} ms", flush=True)

prev = 0.0
print("\n=== deltas ===", flush=True)
for stop in STAGES:
    name = stop or "full"
    print(f"{name}: {results[name]:.1f} ms (+{results[name]-prev:.1f})",
          flush=True)
    prev = results[name]
print("DONE", flush=True)
