#!/usr/bin/env python
"""Single-chip inference benchmark.

Measures full-pipeline PBNet inference (quantize -> topology -> MinkUNet34C
backbone + heads -> clustering -> local-scene D_Unet mask branch -> ScoreNet)
in scenes/sec on one TPU chip, with static capacities sized for a typical
ScanNet v2 val scene (~140k points, ~90k voxels at 2 cm).  Because every
stage is static-shape, latency is content-independent: the number measures
deployed per-scene inference cost for these capacities.

Baseline: the reference publishes no throughput (SURVEY.md §6); we assume
2.5 scenes/s for the full PBNet pipeline on an RTX 3090 (per-scene ~400 ms,
typical of the HAIS/SoftGroup family it builds on).  vs_baseline is
scenes_per_sec / 2.5.

Prints ONE JSON line:
  {"metric": "inference_scenes_per_sec", "value": N, "unit": "scenes/s",
   "vs_baseline": N/2.5}
"""

import json
import sys
import time

import numpy as np

import pbnet_tpu  # noqa: F401  (persistent compile cache)

ASSUMED_3090_SCENES_PER_SEC = 2.5


def box_surface(rng, n, center, size):
    """Sample n points on the surface of an axis-aligned box."""
    sx, sy, sz = size
    areas = np.array([sy * sz, sy * sz, sx * sz, sx * sz, sx * sy, sx * sy])
    face = rng.choice(6, n, p=areas / areas.sum())
    u, v = rng.rand(n), rng.rand(n)
    pts = np.zeros((n, 3))
    for f in range(6):
        m = face == f
        ax = f // 2
        side = f % 2
        uv_axes = [a for a in range(3) if a != ax]
        pts[m, ax] = side * size[ax]
        pts[m, uv_axes[0]] = u[m] * size[uv_axes[0]]
        pts[m, uv_axes[1]] = v[m] * size[uv_axes[1]]
    return pts - np.array(size) / 2 + np.array(center)


def make_scene(rng, n_pts=140_000):
    """Room-like SURFACE scene (points on planes/boxes + 5 mm sensor noise),
    matching real ScanNet occupancy (~0.5 voxels/point at 2 cm)."""
    pts = []
    n_floor = int(n_pts * 0.35)
    floor = np.concatenate(
        [rng.rand(n_floor, 2) * 4.5, np.zeros((n_floor, 1))], 1
    )
    pts.append(floor)
    n_wall = int(n_pts * 0.25)
    w = np.concatenate(
        [rng.rand(n_wall, 1) * 4.5, np.zeros((n_wall, 1)),
         rng.rand(n_wall, 1) * 2.5], 1
    )
    pts.append(w)
    remaining = n_pts - n_floor - n_wall
    n_obj = 14
    per = remaining // n_obj
    for i in range(n_obj):
        c = np.array([0.4 + rng.rand() * 3.7, 0.4 + rng.rand() * 3.7,
                      0.3 + rng.rand() * 0.5])
        size = 0.3 + rng.rand(3) * 0.7
        pts.append(box_surface(rng, per, c, size))
    xyz = np.concatenate(pts)[:n_pts]
    xyz += rng.randn(*xyz.shape) * 0.002  # sensor noise
    xyz -= xyz.min(0)
    return xyz.astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from pbnet_tpu.config import StaticShapes
    from pbnet_tpu.core.quantize import sparse_quantize_np
    from pbnet_tpu.models.pbnet import PBNet

    shapes = StaticShapes(
        point_cap=147_456,
        voxel_caps=(98_304, 45_056, 16_384, 6_144, 2_048),
        cluster_cap=256,
        local_point_cap=262_144,
        local_voxel_caps=(131_072, 57_344, 20_480, 8_192, 3_072),
        score_voxel_caps=(98_304, 45_056, 16_384, 6_144, 2_048),
        instance_cap=128,
        cluster_band=4_096,
        # tight extent for a single ~4.5m scene: smaller dense-grid tables
        # gather ~2-3x faster than the 1GB worst-case table
        grid_extent=(1, 256, 256, 160),
    )
    rng = np.random.RandomState(0)
    xyz = make_scene(rng)
    vox, index, _ = sparse_quantize_np(xyz, 0.02)
    n, m = xyz.shape[0], vox.shape[0]
    print(f"scene: {n} points, {m} voxels", file=sys.stderr)
    P, V = shapes.point_cap, shapes.voxel_caps[0]
    assert n <= P and m <= V, (n, m)

    def pad(a, cap, fill=0):
        out = np.full((cap,) + a.shape[1:], fill, a.dtype)
        out[: a.shape[0]] = a
        return out

    batch = {
        "vox_coords": pad(np.concatenate(
            [np.zeros((m, 1), np.int32), vox], 1), V),
        "vox_feats": pad(rng.randn(m, 6).astype(np.float32) * 0.1, V),
        "vox_valid": np.arange(V) < m,
        "xyz": pad(xyz, P),
        "point_batch": np.zeros(P, np.int32),
        "point_valid": np.arange(P) < n,
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    model = PBNet(shapes=shapes)
    t0 = time.time()
    init_fn = jax.jit(
        lambda key, b: model.init(
            key, b, with_instances=True, with_labels=False, train=False
        )
    )
    variables = init_fn(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(variables)
    print(f"init (jitted): {time.time()-t0:.1f}s", file=sys.stderr)

    @jax.jit
    def fwd(variables, batch):
        ret = model.apply(
            variables, batch, with_instances=True, with_labels=False,
            train=False,
        )
        # scalar digest: on this backend only a value fetch guarantees the
        # computation actually executed (block_until_ready returns early)
        digest = (
            jnp.sum(ret["sem_pred_score_p"])
            + jnp.sum(ret["clt_scores"])
            + jnp.sum(ret["mask_scores"])
            + ret["cluster"].num_clusters.astype(jnp.float32)
        )
        return ret, digest

    t0 = time.time()
    out, digest = fwd(variables, batch)
    _ = float(digest)
    print(f"compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)

    # warmup + timed runs (each iteration fetches the scalar digest)
    for _ in range(2):
        _ = float(fwd(variables, batch)[1])
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        _ = float(fwd(variables, batch)[1])
    dt = (time.time() - t0) / iters
    scenes_per_sec = 1.0 / dt
    print(
        f"latency: {dt*1e3:.1f} ms/scene; digest={float(digest):.3f}"
        f" clusters={int(out['cluster'].num_clusters)}"
        f" proposals={int(out['num_final_proposals'])}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "inference_scenes_per_sec",
        "value": round(scenes_per_sec, 4),
        "unit": "scenes/s",
        "vs_baseline": round(scenes_per_sec / ASSUMED_3090_SCENES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
