"""Trained-content clustering timing (round-5 VERDICT item 8).

The bench headline drives the instance stage with ORACLE semantics/offsets
(tight blobs).  A trained checkpoint's offsets are noisier, which could need
more label-propagation rounds.  This script fits the model on the bench
scene (backbone losses only: semantic CE + offset L1/dir), then times
``binary_cluster`` on the PREDICTED semantics/offsets at two stages of
training (noisy early / converged late) against the oracle content, and
reports the propagation-round counts (ClusterResult.prop_rounds).

Run from the repo root on the real TPU: python perf/trained_cluster_r5.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import pbnet_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import optax

from pbnet_tpu.config import StaticShapes
from pbnet_tpu.core.quantize import sparse_quantize_np
from pbnet_tpu.models import losses as L
from pbnet_tpu.models.pbnet import COUNT_MEAN, PBNet
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


sem_o = pad(sem_gt.astype(np.int32), P, -1)
center_of = np.zeros((P, 3), np.float32)
has_ins = ins_gt >= 0
center_of[:n][has_ins] = obj_centers[ins_gt[has_ins]]
offs_o = np.zeros((P, 3), np.float32)
offs_o[:n][has_ins] = center_of[:n][has_ins] - xyz[has_ins]

info = np.full((P, 9), -100.0, np.float32)
info[:n, 0:3] = center_of[:n]
pointnum = np.zeros(shapes.instance_cap, np.int32)
for i in range(int(ins_gt.max()) + 1):
    pointnum[i] = int((ins_gt == i).sum())

batch = {
    "vox_coords": pad(np.concatenate([np.zeros((m, 1), np.int32), vox], 1), V),
    "vox_feats": pad(rng.randn(m, 6).astype(np.float32) * 0.1, V),
    "vox_valid": np.arange(V) < m,
    "xyz": pad(xyz, P),
    "point_batch": np.zeros(P, np.int32),
    "point_valid": np.arange(P) < n,
    "sem_label": pad(sem_gt.astype(np.int32), P, -100),
    "ins_label": pad(ins_gt.astype(np.int32), P, -100),
    "inst_info": info,
    "instance_pointnum": pointnum,
}
batch = {k: jnp.asarray(v) for k, v in batch.items()}

model = PBNet(shapes=shapes)
t0 = time.time()
variables = jax.jit(lambda key, b: model.init(
    key, b, with_instances=False, with_labels=True, train=True
))(jax.random.PRNGKey(0), batch)
jax.block_until_ready(variables)
print(f"init: {time.time()-t0:.0f}s", flush=True)


class CL:
    fg_thresh, bg_thresh = 0.95, 0.2


tx = optax.scale_by_adam()
opt0 = tx.init(variables["params"])


@functools.partial(jax.jit, static_argnums=(4,))
def train_n(params, stats, opt, b, steps):
    def one(carry, _):
        params, stats, opt = carry

        def lf(p):
            r, upd = model.apply(
                {"params": p, "batch_stats": stats}, b, with_instances=False,
                with_labels=True, train=True, mutable=["batch_stats"],
            )
            loss, aux = L.model_fn(r, b, CL, False)
            return loss, upd["batch_stats"]

        (loss, ns), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, opt2 = tx.update(g, opt, params)
        p2 = optax.apply_updates(
            params, jax.tree_util.tree_map(lambda x: -1e-3 * x, u))
        return (p2, ns, opt2), (loss, optax.global_norm(g))

    (p2, ns, opt2), (losses, gns) = jax.lax.scan(
        one, (params, stats, opt), None, length=steps)
    return p2, ns, opt2, losses, gns


@jax.jit
def predict(params, stats, b):
    bb = model.apply({"params": params, "batch_stats": stats}, b, False,
                     method=PBNet.backbone)
    return bb["sem_pred_p"], bb["offset_pred_p"]


def cluster_time(label, sem_in, offs_in):
    """Chained-timing of the fg-compacted clustering on given content."""
    sem_in = jnp.asarray(sem_in)
    offs_in = jnp.asarray(offs_in)
    cm = jnp.asarray(COUNT_MEAN)
    xyz_p = jnp.asarray(pad(xyz, P))
    NF = shapes.fg_point_cap

    @jax.jit
    def run(offs, r):
        sem_clip = jnp.clip(sem_in, 0, 19)
        ok = jnp.arange(P) < n
        class_count = jax.ops.segment_sum(
            ok.astype(jnp.int32), jnp.where(ok, sem_clip, 20), num_segments=21
        )[:20]
        class_ok = class_count.astype(jnp.float32) >= 0.05 * cm
        fg = ok & (sem_in >= 2) & class_ok[sem_clip]
        okey = jnp.where(fg, 0, 1).astype(jnp.int32)
        _, sel = jax.lax.sort((okey, jnp.arange(P, dtype=jnp.int32)), num_keys=2)
        sel = sel[:NF]
        live = fg[sel]

        def body(_, acc):
            res = cl.binary_cluster(
                (xyz_p + offs)[sel] + acc * 1e-30, xyz_p[sel], sem_in[sel],
                jnp.zeros((NF,), jnp.int32), live,
                radius=0.04, min_pts=31, count_mean=cm,
                cluster_cap=shapes.cluster_cap, band=shapes.cluster_band,
                nn_exact_cap=shapes.nn_exact_cap,
            )
            return (jnp.sum(res.cluster_id.astype(jnp.float32))
                    + jnp.sum(res.centers),
                    res.num_clusters, res.prop_rounds, res.band_overflow)

        def loop(i, c):
            d, nc, pr, bo = body(i, c[0])
            return (d, nc, pr, bo)

        return jax.lax.fori_loop(
            0, r, loop,
            (jnp.float32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        )

    t0 = time.time()
    out = run(offs_in, 2)
    _ = float(out[0])
    print(f"  [{label} compile {time.time()-t0:.0f}s]", flush=True)
    t0 = time.time()
    d, nc, pr, bo = run(offs_in, 10)
    _ = float(d)
    dt = (time.time() - t0) / 10 * 1e3
    print(f"{label}: {dt:.2f} ms  clusters={int(nc)} prop_rounds={int(pr)} "
          f"band_overflow={int(bo)}", flush=True)
    return dt


# oracle reference point
cluster_time("cluster[oracle]", sem_o, offs_o)

params, stats = variables["params"], variables["batch_stats"]
opt = opt0
total = 0
for phase, reps in (("early", 1), ("late", 6)):
    # repeat the CACHED 40-step scan instead of compiling/running one long
    # scan (a single 260-step execution crashed the TPU worker once)
    t0 = time.time()
    for _ in range(reps):
        params, stats, opt, losses, gns = train_n(params, stats, opt, batch,
                                                  40)
        _ = float(losses[-1]) + float(gns[-1])
    total += reps * 40
    print(f"trained {total} steps ({time.time()-t0:.0f}s): "
          f"loss {float(losses[0]):.3f} -> {float(losses[-1]):.3f}",
          flush=True)
    sem_p, offs_p = predict(params, stats, batch)
    sem_np = np.asarray(sem_p)
    acc = float((sem_np[:n] == sem_gt).mean())
    oerr = float(np.abs(np.asarray(offs_p)[:n] - offs_o[:n]).mean())
    print(f"  sem_acc={acc:.3f} offset_mae={oerr:.3f}", flush=True)
    cluster_time(f"cluster[trained-{phase} {total}st]", sem_np, offs_p)

print("DONE", flush=True)
