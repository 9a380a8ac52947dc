"""Round-4 verify drive: full 3-stage PBNet forward on the real TPU with the
banded one-hot conv path ENABLED on the main topology.

Checks: finiteness, zero overflow (incl. plan/band counters), real clusters/
proposals, steady-state latency vs the r3 baseline (~308 ms), and topo2 map
span statistics (to size onehot_spans_local)."""
import dataclasses
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

SPANS_MAIN = (0, 1280, 768, 0, 0)  # L0 loses; L3/L4 ride the dense path

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
    onehot_spans=SPANS_MAIN,
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
t0 = time.time()
variables = jax.jit(
    lambda key, b: model.init(key, b, with_instances=True, with_labels=False,
                              train=False)
)(jax.random.PRNGKey(0), batch)
jax.block_until_ready(variables)
print(f"init: {time.time()-t0:.1f}s", flush=True)

# oracle stage-1 outputs (same as bench.py)
sem_o = pad(sem_gt.astype(np.int32), P, -1)
center_of = np.zeros((P, 3), np.float32)
has_ins = ins_gt >= 0
center_of[:n][has_ins] = obj_centers[ins_gt[has_ins]]
offs_o = np.zeros((P, 3), np.float32)
offs_o[:n][has_ins] = center_of[:n][has_ins] - xyz[has_ins]
soft_o = np.full((P, 20), 0.05, np.float32)
soft_o[np.arange(P), np.clip(sem_o, 0, 19)] = 0.9
oracle = tuple(jnp.asarray(a) for a in (sem_o, offs_o, soft_o))


@jax.jit
def chained(variables, batch, oracle, r):
    sem_oo, offs_oo, soft_oo = oracle

    def body(_, carry):
        acc = carry[0]
        b2 = dict(batch)
        b2["vox_feats"] = batch["vox_feats"] + acc * 1e-30
        bb = model.apply(variables, b2, False, method=PBNet.backbone)
        bb = dict(bb)
        d_bb = (jnp.sum(bb["sem_pred_score_p"]) + jnp.sum(bb["offset_pred_p"]))
        band_ov = bb["overflow_band"]
        bb["sem_pred_p"] = sem_oo
        bb["offset_pred_p"] = offs_oo + acc * 1e-30
        bb["sem_soft_p"] = soft_oo
        ret = model.apply(variables, b2, bb, False, False,
                          method=PBNet.instance_stage)
        digest = (d_bb + jnp.sum(ret["clt_scores"])
                  + jnp.sum(ret["mask_scores"])
                  + ret["cluster"].num_clusters.astype(jnp.float32))
        ov = sum(v.astype(jnp.int32) for v in ret["overflow"].values())
        return (digest, ret["cluster"].num_clusters,
                ret["num_final_proposals"], ov + band_ov)

    return jax.lax.fori_loop(
        0, r, body, (jnp.float32(0.0), jnp.int32(0), jnp.int32(0),
                     jnp.int32(0)))


t0 = time.time()
out = chained(variables, batch, oracle, 2)
d = float(out[0])
print(f"compile+warm: {time.time()-t0:.1f}s digest={d:.3f}", flush=True)
assert np.isfinite(d), d
t0 = time.time()
digest, ncl, nprop, ov = chained(variables, batch, oracle, 10)
d = float(digest)
dt = (time.time() - t0) / 10
print(f"latency: {dt*1e3:.1f} ms/scene digest={d:.3f} clusters={int(ncl)} "
      f"proposals={int(nprop)} overflow={int(ov)}", flush=True)
assert np.isfinite(d)
assert int(ncl) > 0 and int(nprop) > 0
assert int(ov) == 0, f"overflow {int(ov)}"

# ---- topo2 span statistics (for onehot_spans_local) ----
@jax.jit
def topo2_maps(variables, batch, oracle):
    sem_oo, offs_oo, soft_oo = oracle
    bb = model.apply(variables, batch, False, method=PBNet.backbone)
    bb = dict(bb)
    bb["sem_pred_p"] = sem_oo
    bb["offset_pred_p"] = offs_oo
    bb["sem_soft_p"] = soft_oo
    ret = model.apply(variables, batch, bb, False, False,
                      method=PBNet.instance_stage, stop_after="topo2:all")
    return ret["topo2_maps"]


stem_map, k3_maps, down_maps, up_maps, his, _ = (
    list(x) if isinstance(x, tuple) else x for x in topo2_maps(
        variables, batch, oracle))


def spans(km_h, kz, cnt, tm=256):
    K = km_h.shape[1]
    worst = 0
    for g in range(K // kz):
        blk = km_h[:cnt, g * kz:(g + 1) * kz]
        pres = blk >= 0
        for t in range(0, cnt, tm):
            b, p = blk[t:t + tm], pres[t:t + tm]
            if p.any():
                worst = max(worst, int(b[p].max() - b[p].min() + 1))
    return worst


import pbnet_tpu.core.coords as ck  # noqa: E402

counts2 = [int(np.sum(np.asarray(h) != ck.SENTINEL)) for h in his]
print(f"topo2 counts: {counts2}", flush=True)
for l, km in enumerate(k3_maps):
    print(f"topo2 L{l} k3 span: {spans(np.asarray(km), 3, counts2[l])}",
          flush=True)
for l, km in enumerate(down_maps):
    print(f"topo2 down L{l} span: {spans(np.asarray(km), 2, counts2[l+1])}",
          flush=True)
for l, km in enumerate(up_maps):
    print(f"topo2 up L{l} span: {spans(np.asarray(km), 2, counts2[l])}",
          flush=True)
print("DRIVE OK", flush=True)
