"""A/B: full main-topology build with xy-stacked tables vs per-group
1-lane gathers (xy_radius=0)."""
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

CAPS = (98_304, 45_056, 16_384, 6_144, 2_048)
EXTENT = (1, 256, 256, 160)

rng = np.random.RandomState(0)
xyz, _, _, _ = make_scene(rng)
vox, _, _ = sparse_quantize_np(xyz, 0.02)
m = vox.shape[0]
V = CAPS[0]


def pad(a, cap, fill=0):
    out = np.full((cap,) + a.shape[1:], fill, a.dtype)
    out[: a.shape[0]] = a
    return out


coords = jnp.asarray(pad(np.concatenate([np.zeros((m, 1), np.int32), vox], 1), V))
feats0 = jnp.asarray(pad(rng.randn(m, 6).astype(np.float32) * 0.1, V))
vvalid = jnp.asarray(np.arange(V) < m)


def build_fn(radius_mode):
    def fn(coords, feats0, vvalid, r_):
        def body(_, acc):
            level0, _f = make_level0(coords, feats0 + acc * 1e-30, vvalid)
            if radius_mode == "none":
                grids = lambda lv: tp.build_grid(lv, EXTENT, xy_radius=0)  # noqa: E731
                t = tp.build_unet_topology(level0, list(CAPS), grids=grids)
            else:
                t = tp.build_unet_topology(level0, list(CAPS), extent=EXTENT)
            d = sum(jnp.sum(lv.hi.astype(jnp.float32) * 1e-6)
                    for lv in t.levels)
            for km in (t.stem_map,) + t.k3_maps + t.down_maps + t.up_maps:
                d = d + jnp.sum(km.astype(jnp.float32) * 1e-6)
            return d
        return jax.lax.fori_loop(0, r_, body, jnp.float32(0.0))
    return fn


for mode in ("stacked", "none"):
    f = jax.jit(build_fn(mode))
    t0 = time.time()
    a = float(f(coords, feats0, vvalid, 2))
    c = time.time() - t0
    t0 = time.time()
    b = float(f(coords, feats0, vvalid, 15))
    dt = (time.time() - t0) / 15 * 1e3
    print(f"topo all [{mode}]: {dt:.2f} ms (compile {c:.0f}s, digest {b:.3f})",
          flush=True)
print("DONE", flush=True)
