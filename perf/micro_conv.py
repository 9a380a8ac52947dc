"""Conv microbench on the REAL bench topology + anchor-span statistics.

Answers two questions for the banded one-hot MXU gather-conv design:
1. What do the dominant convs cost today (gather-GEMM path)?
2. How wide are the per-tile index bands of each kernel-map group (the
   one-hot kernel must DMA [band_start, band_start+SPAN) per output tile;
   span overflow = dropped neighbor contributions, so SPAN must cover the
   observed spans with margin)?

Run on the TPU: python _scratch/micro_conv.py
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
print(f"topology built in {time.time()-t0:.1f}s; counts={counts}", file=sys.stderr)

# ---- anchor span statistics ----
TMs = (256, 512)
for l, km in enumerate(topo.k3_maps):
    km_h = np.asarray(km)
    M = km_h.shape[0]
    cnt = counts[l]
    for TM in TMs:
        worst = 0
        p99s = []
        for g in range(9):
            blk = km_h[:cnt, g * 3 : g * 3 + 3]
            pres = blk >= 0
            spans = []
            for t0i in range(0, cnt, TM):
                b = blk[t0i : t0i + TM]
                p = pres[t0i : t0i + TM]
                if not p.any():
                    continue
                vals = b[p]
                spans.append(vals.max() - vals.min() + 1)
            if spans:
                spans = np.array(spans)
                worst = max(worst, int(spans.max()))
                p99s.append(int(np.percentile(spans, 99)))
        print(f"L{l} M={cnt} TM={TM}: worst-group max span={worst} "
              f"p99-per-group={max(p99s) if p99s else 0}")

# stem map (k=5 -> 125 cols, kz=5, 25 groups)
km_h = np.asarray(topo.stem_map)
cnt = counts[0]
for TM in TMs:
    worst = 0
    for g in range(25):
        blk = km_h[:cnt, g * 5 : g * 5 + 5]
        pres = blk >= 0
        for t0i in range(0, cnt, TM):
            b = blk[t0i : t0i + TM]
            p = pres[t0i : t0i + TM]
            if p.any():
                vals = b[p]
                worst = max(worst, int(vals.max() - vals.min() + 1))
    print(f"stem TM={TM}: worst-group max span={worst}")

# down/up maps (k=8, kz=2, 4 groups)
for l, km in enumerate(topo.down_maps):
    km_h = np.asarray(km)
    cnt = counts[l + 1]
    TM = 256
    worst = 0
    for g in range(4):
        blk = km_h[:cnt, g * 2 : g * 2 + 2]
        pres = blk >= 0
        for t0i in range(0, cnt, TM):
            b = blk[t0i : t0i + TM]
            p = pres[t0i : t0i + TM]
            if p.any():
                vals = b[p]
                worst = max(worst, int(vals.max() - vals.min() + 1))
    print(f"down L{l}->L{l+1} TM={TM}: worst-group max span={worst}")


# ---- current conv costs (chained, one digest fetch) ----
def time_conv(name, cin, cout, kmap, kmap_bwd, valid_l, iters=30):
    M = kmap.shape[0]
    x = jnp.asarray(rng.randn(M, cin).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(kmap.shape[1], cin, cout).astype(np.float32) * 0.05)

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
    print(f"{name}: {dt:.2f} ms")
    return dt


v = [lv.valid for lv in topo.levels]
time_conv("L0 k3 96->96", 96, 96, topo.k3_maps[0], topo.k3_maps[0][:, ::-1], v[0])
time_conv("L0 k3 128->96", 128, 96, topo.k3_maps[0], topo.k3_maps[0][:, ::-1], v[0])
time_conv("L1 k3 32->32", 32, 32, topo.k3_maps[1], topo.k3_maps[1][:, ::-1], v[1])
time_conv("L1 k3 128->96", 128, 96, topo.k3_maps[1], topo.k3_maps[1][:, ::-1], v[1])
time_conv("L2 k3 64->64", 64, 64, topo.k3_maps[2], topo.k3_maps[2][:, ::-1], v[2])
time_conv("stem k5 6->32", 6, 32, topo.stem_map, topo.stem_map[:, ::-1], v[0])
time_conv("L0->L1 down 32->32", 32, 32, topo.down_maps[0], topo.up_maps[0], v[1])
time_conv("L1->L0 up 128->96", 128, 96, topo.up_maps[0], topo.down_maps[0], v[0])
