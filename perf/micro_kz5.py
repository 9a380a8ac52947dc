"""Window-width A/B for the kz=5 cin=34 regime (the D_Unet stem conv).

ADVICE r4: _window_plan routes every kz*cin <= 192 combo to the full-z-run
wide-row path on evidence measured only at 64ch k3 / 96ch k2.  At cin=34 the
full run is a 170-lane (2-tile) row — the regime where rows split and lose.
Measures w = 5 (current), 3, 2 on the real local-scene topology scale.

Run on the TPU: python perf/micro_kz5.py
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


@jax.jit
def build(coords, feats0, valid):
    level0, _ = make_level0(coords, feats0, valid)
    return tp.build_unet_topology(
        level0, list(shapes.voxel_caps), extent=shapes.grid_extent
    )


topo = build(coords, feats0, valid)
# use the MAIN stem map truncated to the local cap as a stand-in for the
# derived local stem map (same 125-column structure, same z-run statistics)
ML = shapes.local_voxel_caps[0]
kmap = topo.stem_map[:ML]
valid_l = topo.levels[0].valid[:ML]
CIN, COUT = 34, 32
x = jnp.asarray(rng.randn(ML, CIN).astype(np.float32) * 0.1)
w = jnp.asarray(rng.randn(125, CIN, COUT).astype(np.float32) * 0.05)

y_ref = None
for wplan in (5, 3, 2):
    def conv(x, w, wp=wplan):
        g = sparse_ops._window_img2col(x, kmap, 5, wp)
        y = jax.lax.dot_general(
            g, w.astype(sparse_ops.COMPUTE_DTYPE).reshape(125 * CIN, COUT),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.where(valid_l[:, None], y, 0.0)

    yv = jax.jit(conv)(x, w)
    if y_ref is None:
        y_ref = yv
    else:
        err = float(jnp.max(jnp.abs(yv - y_ref)))
        print(f"w={wplan}: max|diff| vs w=5 = {err:.4f}", flush=True)

    @jax.jit
    def chain(x, w, r, wp=wplan):
        def body(_, acc):
            return jnp.sum(conv(x + acc * 1e-30, w, wp))
        return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))

    t0 = time.time()
    _ = float(chain(x, w, 2))
    print(f"  [w={wplan} compile {time.time()-t0:.0f}s]", flush=True)
    t0 = time.time()
    _ = float(chain(x, w, 20))
    dt = (time.time() - t0) / 20 * 1e3
    print(f"stem kz=5 cin=34 w={wplan}: {dt:.2f} ms", flush=True)
print("DONE", flush=True)
