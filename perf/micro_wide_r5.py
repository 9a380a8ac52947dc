"""Round-5 microbench: FULL-COVERAGE z-run windows beyond the 192-lane gate.

_window_plan caps full-coverage windows at kz*cin <= 192 (measured r4/r5:
full coverage at 170-192 lanes wins big; w=2 partial coverage at 96ch
loses).  Never measured: full coverage w=kz=3 at cin=96 (288-lane rows,
3 tiles) and cin=128 (384 lanes) — the regime of the 34C decoder's L0/L1
k3 convs, the largest single line of the 231 ms pipeline.  If a 3-tile-row
gather costs < 3x a 1-tile gather (it replaces 3 gather ops per group),
this wins; the partial-coverage loss came from the chunk-loop selects that
full coverage doesn't pay.

Run on the TPU: python perf/micro_wide_r5.py
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
from pbnet_tpu.nn import sparse_ops

from bench import make_scene

shapes = StaticShapes(
    point_cap=147_456,
    voxel_caps=(98_304, 45_056, 16_384, 6_144, 2_048),
    cluster_cap=32,
    local_point_cap=57_344,
    local_voxel_caps=(45_056, 22_528, 9_216, 4_608, 2_048),
    score_voxel_caps=(45_056, 22_528, 9_216, 4_608, 2_048),
    instance_cap=32,
    cluster_band=4_096,
    fg_point_cap=57_344,
    nn_exact_cap=1_024,
    grid_extent=(1, 256, 256, 160),
)

rng = np.random.RandomState(0)
xyz, sem_gt, ins_gt, obj_centers = make_scene(rng)
vox, index, _ = sparse_quantize_np(xyz, 0.02)
m = vox.shape[0]
V = shapes.voxel_caps[0]
print(f"scene: {m} voxels", file=sys.stderr)


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
    topo = tp.build_unet_topology(
        level0, list(shapes.voxel_caps), extent=shapes.grid_extent
    )
    return topo


t0 = time.time()
topo = build(coords, feats0, valid)
counts = [int(lv.count) for lv in topo.levels]
print(f"topology built in {time.time()-t0:.1f}s; level counts={counts}",
      file=sys.stderr)


def time_conv(name, cin, cout, kmap, kmap_bwd, valid_l, iters=30):
    x = jnp.asarray(rng.randn(kmap.shape[0], cin).astype(np.float32) * 0.1)
    w = jnp.asarray(
        rng.randn(kmap.shape[1], cin, cout).astype(np.float32) * 0.05)

    @jax.jit
    def chain(x, w, r):
        def body(_, acc):
            y = sparse_ops.gather_conv(
                x + acc * 1e-30, kmap, w, valid_l, kmap_bwd=kmap_bwd
            )
            return jnp.sum(y)

        return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))

    _ = float(chain(x, w, 2))
    t0 = time.time()
    _ = float(chain(x, w, iters))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


orig_plan = sparse_ops._window_plan


def force_full(kz, cin):
    if kz is not None and kz > 1:
        return kz
    return None


CASES = [
    ("L0 k3 cin=96 cout=96 (34C dec)", 0, 96, 96),
    ("L1 k3 cin=128 cout=128 (34C dec)", 1, 128, 128),
    ("L1 k3 cin=64 cout=64 (enc)", 1, 64, 64),
    ("L0 k3 cin=32 cout=32 (enc)", 0, 32, 32),
]

for name, l, cin, cout in CASES:
    km = topo.k3_maps[l]
    kmb = km[:, ::-1]
    vl = topo.levels[l].valid
    sparse_ops._window_plan = orig_plan
    a = time_conv(f"cur   {name}", cin, cout, km, kmb, vl)
    sparse_ops._window_plan = force_full
    b = time_conv(f"wfull {name}", cin, cout, km, kmb, vl)
    sparse_ops._window_plan = orig_plan
    print(f"  -> full-coverage {'WINS' if b < a else 'loses'} "
          f"({a:.2f} -> {b:.2f} ms)", flush=True)
