"""Experiment: (1) bf16 wide-row window gathers, (2) onehot_conv on real maps,
(3) chained-conv overhead at L2."""
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
from pbnet_tpu.nn import onehot_conv as oc

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


t0 = time.time()
topo = build(coords, feats0, valid)
counts = [int(lv.count) for lv in topo.levels]
print(f"topology in {time.time()-t0:.1f}s counts={counts}", flush=True)
v = [lv.valid for lv in topo.levels]

# up-map spans (fine outputs reading coarse level)
for l, km in enumerate(topo.up_maps[:0]):
    km_h = np.asarray(km)
    cnt = counts[l]
    worst = 0
    for g in range(4):
        blk = km_h[:cnt, g * 2 : g * 2 + 2]
        pres = blk >= 0
        for t0i in range(0, cnt, 256):
            b, p = blk[t0i : t0i + 256], pres[t0i : t0i + 256]
            if p.any():
                worst = max(worst, int(b[p].max() - b[p].min() + 1))
    print(f"up L{l+1}->L{l} TM=256: worst span={worst}", flush=True)


def timeit(name, fn, *args, iters=30):
    f = jax.jit(fn)
    _ = float(f(*args, 2))
    t0 = time.time()
    _ = float(f(*args, iters))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def chain(body):
    def run(x, w, r):
        def it(_, acc):
            return jnp.sum(body(x + acc * 1e-30, w))
        return jax.lax.fori_loop(0, r, it, jnp.float32(0.0))
    return run


# ---- 1: bf16 wide-row window gathers on the L0 k3 map ----
def conv_w(wbudget):
    def body(x, w):
        kz = 3
        ww = min(kz, max(1, wbudget // 96))
        if ww < 2:
            g = sparse_ops._take_rows0(
                x.astype(jnp.bfloat16), topo.k3_maps[0]
            ).reshape(topo.k3_maps[0].shape[0], 27 * 96)
        else:
            g = sparse_ops._window_img2col(x, topo.k3_maps[0], kz, ww)
        y = jax.lax.dot_general(
            g, w.astype(jnp.bfloat16).reshape(27 * 96, 96),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.where(v[0][:, None], y, 0.0)
    return body


M0 = topo.k3_maps[0].shape[0]
x0 = jnp.asarray(rng.randn(M0, 96).astype(np.float32) * 0.1)
w0 = jnp.asarray(rng.randn(27, 96, 96).astype(np.float32) * 0.05)

# cin=64 window comparison at L1 (w=2 both, but 128-lane rows vs wider)
M1 = topo.k3_maps[1].shape[0]
x1 = jnp.asarray(rng.randn(M1, 64).astype(np.float32) * 0.1)
w1 = jnp.asarray(rng.randn(27, 64, 64).astype(np.float32) * 0.05)


def conv_w64(wbudget):
    def body(x, w):
        ww = min(3, max(1, wbudget // 64))
        g = sparse_ops._window_img2col(x, topo.k3_maps[1], 3, ww)
        y = jax.lax.dot_general(
            g, w.astype(jnp.bfloat16).reshape(27 * 64, 64),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.where(v[1][:, None], y, 0.0)
    return body



# ---- 2: onehot_conv on real maps ----
def time_onehot(name, kmap, kz, m_in_cap, cin, cout, vout, span, tm=256,
                iters=30):
    plan = oc.build_onehot_plan(kmap, kz, m_in_cap, tm=tm, span=span)
    if plan is None:
        print(f"{name}: no plan (M%tm or m_in<span)", flush=True)
        return
    ovf = int(plan.overflow)
    x = jnp.asarray(rng.randn(m_in_cap, cin).astype(np.float32) * 0.1)
    w = jnp.asarray(
        rng.randn(kmap.shape[1], cin, cout).astype(np.float32) * 0.05)

    def body(x, w):
        return oc.onehot_conv(x, plan, w, vout)

    dt = timeit(f"{name} span={span} (ovf={ovf})", chain(body), x, w,
                iters=iters)
    return dt


C = shapes.voxel_caps
time_onehot("onehot L1 k3 32->32", topo.k3_maps[1], 3, C[1], 32, 32, v[1], 1024)
time_onehot("onehot L1 k3 128->96", topo.k3_maps[1], 3, C[1], 128, 96, v[1], 1024)
time_onehot("onehot L2 k3 64->64", topo.k3_maps[2], 3, C[2], 64, 64, v[2], 640)
time_onehot("onehot L0 k3 96->96", topo.k3_maps[0], 3, C[0], 96, 96, v[0], 1536)
time_onehot("onehot down L0->L1 32->32", topo.down_maps[0], 2, C[0], 32, 32,
            v[1], 2048)
time_onehot("onehot up L1->L0 128->96", topo.up_maps[0], 2, C[1], 128, 96,
            v[0], 1024)

# ---- 3: chained L2 conv overhead ----
def conv5(x, w):
    y = x
    for _ in range(5):
        y = sparse_ops.gather_conv(y, topo.k3_maps[2], w, v[2])
    return y


x2 = jnp.asarray(rng.randn(topo.k3_maps[2].shape[0], 64).astype(np.float32) * 0.1)
d5 = timeit("L2 k3 64->64 x5 chained", chain(conv5), x2, w1, iters=20)
print(f"  -> per-conv {d5/5:.2f} ms", flush=True)
print("DONE", flush=True)
