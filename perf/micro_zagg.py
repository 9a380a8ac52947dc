"""Z-aggregated high-channel k3 conv prototype vs the current gather path.

Current high-channel (cin >= 96) k3 convs issue 27 row gathers per output
(no z-window applies: full z-run coverage needs >192 lanes, and multi-tile
rows measure disproportionately expensive).  But the z-dimension can be
aggregated BEFORE the gather: apply the per-(group, dz) weights to every
INPUT row (one big GEMM), combine z-neighbors with shift-adds (inputs are
z-contiguous in the key-sorted level), and gather ONE cout-wide row per
(dx, dy) group — 9 gathers instead of 27.

Absent-center handling (output o whose (x+dx, y+dy, z_o) input is missing
while z_o±1 exist): three per-group tables selected by the map's presence
pattern —
  t[j] = W0 x[prev] + W1 x[j] + W2 x[next]   (gather at the center entry)
  U[j] = W0 x[j] + W2 x[j+1 if z-gap == 2]   (gather at the dz=-1 entry)
  V[j] = W2 x[j]                             (gather at the dz=+1 entry)
stacked block-wise; selector index = var * M + entry (var==0 dominates, so
gathers stay monotone-local).  Missing-everything rows gather -1 -> zero.

Run on the TPU: python perf/micro_zagg.py
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
    return tp.build_unet_topology(
        level0, list(shapes.voxel_caps), extent=shapes.grid_extent
    )


topo = build(coords, feats0, valid)
counts = [int(lv.count) for lv in topo.levels]
print(f"counts={counts}", file=sys.stderr)

BF = jnp.bfloat16


def zrun_masks(level):
    """prev_ok / next_ok / gap2_ok per input row of a key-sorted level."""
    c = level.coords
    va = level.valid
    bxy = c[:, :3]
    z = c[:, 3]
    same_prev = jnp.concatenate([
        jnp.zeros((1,), bool), jnp.all(bxy[1:] == bxy[:-1], axis=1)
    ])
    zprev = jnp.concatenate([jnp.zeros((1,), z.dtype), z[:-1]])
    vprev = jnp.concatenate([jnp.zeros((1,), bool), va[:-1]])
    prev_ok = va & vprev & same_prev & (z - zprev == 1)
    same_next = jnp.concatenate([
        jnp.all(bxy[1:] == bxy[:-1], axis=1), jnp.zeros((1,), bool)
    ])
    znext = jnp.concatenate([z[1:], jnp.zeros((1,), z.dtype)])
    vnext = jnp.concatenate([va[1:], jnp.zeros((1,), bool)])
    next_ok = va & vnext & same_next & (znext - z == 1)
    gap2_ok = va & vnext & same_next & (znext - z == 2)
    return prev_ok, next_ok, gap2_ok


def zagg_conv(feats, kmap, weights, valid_out, masks):
    """The 9-gather z-aggregated k3 conv (see module docstring)."""
    prev_ok, next_ok, gap2_ok = masks
    M_in, cin = feats.shape
    M_out, K = kmap.shape
    assert K == 27
    cout = weights.shape[2]
    x = feats.astype(BF)
    # P[j, g, dz] = x[j] @ W[g*3+dz]  — one GEMM
    P = jax.lax.dot_general(
        x, weights.astype(BF).reshape(27 * cin, cout).reshape(27, cin, cout)
        .transpose(1, 0, 2).reshape(cin, 27 * cout),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(BF).reshape(M_in, 9, 3, cout)

    def shift_dn(a):  # a[j-1] at row j
        return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)

    def shift_up(a):  # a[j+1] at row j
        return jnp.concatenate([a[1:], jnp.zeros_like(a[:1])], axis=0)

    t = (jnp.where(prev_ok[:, None, None], shift_dn(P[:, :, 0]), 0)
         + P[:, :, 1]
         + jnp.where(next_ok[:, None, None], shift_up(P[:, :, 2]), 0))
    U = P[:, :, 0] + jnp.where(
        gap2_ok[:, None, None], shift_up(P[:, :, 2]), 0
    )
    Vt = P[:, :, 2]

    km3 = kmap.reshape(M_out, 9, 3)
    p0 = km3[:, :, 0] >= 0
    p1 = km3[:, :, 1] >= 0
    p2 = km3[:, :, 2] >= 0
    # selector: var 0 (t @ center) / 1 (U @ left) / 2 (V @ right) / miss
    idx = jnp.where(
        p1, km3[:, :, 1],
        jnp.where(
            p0, M_in + km3[:, :, 0],
            jnp.where(p2, 2 * M_in + km3[:, :, 2], -1),
        ),
    )
    y = jnp.zeros((M_out, cout), jnp.float32)
    for g in range(9):
        tbl = jnp.concatenate([t[:, g], U[:, g], Vt[:, g]], axis=0)
        safe = jnp.where(idx[:, g] >= 0, idx[:, g], 3 * M_in)
        y = y + jnp.take(
            tbl, safe, axis=0, mode="fill", fill_value=0
        ).astype(jnp.float32)
    return jnp.where(valid_out[:, None], y, 0.0)


def check_and_time(name, cin, cout, level_i, iters=30):
    kmap = topo.k3_maps[level_i]
    lv = topo.levels[level_i]
    valid_l = lv.valid
    masks = jax.jit(zrun_masks)(lv)
    M = kmap.shape[0]
    x = jnp.asarray(rng.randn(M, cin).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.05)

    # correctness vs the production gather path
    y_ref = jax.jit(lambda x, w: sparse_ops.gather_conv(
        x, kmap, w, valid_l, kmap_bwd=kmap[:, ::-1]))(x, w)
    y_new = jax.jit(lambda x, w: zagg_conv(x, w_=None, **{}) if False else
                    zagg_conv(x, kmap, w, valid_l, masks))(x, w)
    err = float(jnp.max(jnp.abs(y_ref - y_new)))
    scale = float(jnp.max(jnp.abs(y_ref))) + 1e-9
    print(f"{name}: max|diff|={err:.4f} (rel {err/scale:.2e})", flush=True)

    def timeit(label, fn):
        @jax.jit
        def chain(x, w, r):
            def body(_, acc):
                return jnp.sum(fn(x + acc * 1e-30, w))
            return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))
        _ = float(chain(x, w, 2))
        t0 = time.time()
        _ = float(chain(x, w, iters))
        dt = (time.time() - t0) / iters * 1e3
        print(f"  {label}: {dt:.2f} ms", flush=True)
        return dt

    a = timeit("gather27", lambda x, w: sparse_ops.gather_conv(
        x, kmap, w, valid_l, kmap_bwd=kmap[:, ::-1]))
    b = timeit("zagg9   ", lambda x, w: zagg_conv(x, kmap, w, valid_l, masks))
    print(f"  speedup {a/b:.2f}x", flush=True)


if len(sys.argv) == 1:
    check_and_time("L0 k3 128->96", 128, 96, 0)
    check_and_time("L0 k3 96->96", 96, 96, 0)
    check_and_time("L1 k3 128->96", 128, 96, 1)
    check_and_time("L1 k3 96->96", 96, 96, 1)
    check_and_time("L2 k3 192->128", 192, 128, 2)
    check_and_time("L2 k3 128->128", 128, 128, 2)
    print("DONE", flush=True)


# ---------------------------------------------------------------------------
# v2: group-major build (9 per-group GEMMs, contiguous t/U/V/concat per
# group), stride-corrected z-adjacency masks, and a gather-only floor.
# ---------------------------------------------------------------------------


def zrun_masks_v2(level):
    """prev/next/gap2 with the LEVEL STRIDE as the z step (coords stay in
    fine-lattice units at every level, so z-adjacent rows differ by stride)."""
    c = level.coords
    va = level.valid
    s = level.stride
    bxy = c[:, :3]
    z = c[:, 3]
    same_prev = jnp.concatenate([
        jnp.zeros((1,), bool), jnp.all(bxy[1:] == bxy[:-1], axis=1)
    ])
    zprev = jnp.concatenate([jnp.zeros((1,), z.dtype), z[:-1]])
    vprev = jnp.concatenate([jnp.zeros((1,), bool), va[:-1]])
    prev_ok = va & vprev & same_prev & (z - zprev == s)
    same_next = jnp.concatenate([
        jnp.all(bxy[1:] == bxy[:-1], axis=1), jnp.zeros((1,), bool)
    ])
    znext = jnp.concatenate([z[1:], jnp.zeros((1,), z.dtype)])
    vnext = jnp.concatenate([va[1:], jnp.zeros((1,), bool)])
    next_ok = va & vnext & same_next & (znext - z == s)
    gap2_ok = va & vnext & same_next & (znext - z == 2 * s)
    return prev_ok, next_ok, gap2_ok


def zagg_conv_v2(feats, kmap, weights, valid_out, masks):
    prev_ok, next_ok, gap2_ok = masks
    M_in, cin = feats.shape
    M_out, K = kmap.shape
    cout = weights.shape[2]
    x = feats.astype(BF)
    wB = weights.astype(BF)
    km3 = kmap.reshape(M_out, 9, 3)
    p0 = km3[:, :, 0] >= 0
    p1 = km3[:, :, 1] >= 0
    p2 = km3[:, :, 2] >= 0
    idx = jnp.where(
        p1, km3[:, :, 1],
        jnp.where(p0, M_in + km3[:, :, 0],
                  jnp.where(p2, 2 * M_in + km3[:, :, 2], 3 * M_in)),
    )
    po = prev_ok[:, None]
    no = next_ok[:, None]
    g2 = gap2_ok[:, None]

    def shift_dn(a):
        return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)

    def shift_up(a):
        return jnp.concatenate([a[1:], jnp.zeros_like(a[:1])], axis=0)

    y = jnp.zeros((M_out, cout), jnp.float32)
    for g in range(9):
        Wg = wB[3 * g : 3 * g + 3].reshape(3 * cin, cout)
        Pg = jax.lax.dot_general(
            x, Wg.reshape(3, cin, cout).transpose(1, 0, 2).reshape(cin, 3 * cout),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(BF)  # (M_in, 3*cout): [dz-1 | dz0 | dz+1] blocks
        P0 = Pg[:, :cout]
        P1 = Pg[:, cout : 2 * cout]
        P2 = Pg[:, 2 * cout :]
        t_g = jnp.where(po, shift_dn(P0), 0) + P1 + jnp.where(no, shift_up(P2), 0)
        U_g = P0 + jnp.where(g2, shift_up(P2), 0)
        tbl = jnp.concatenate([t_g, U_g, P2], axis=0)
        y = y + jnp.take(
            tbl, idx[:, g], axis=0, mode="fill", fill_value=0
        ).astype(jnp.float32)
    return jnp.where(valid_out[:, None], y, 0.0)


def gather9_floor(tbl9, idx9, valid_out, cout):
    """Floor: 9 gathers from prebuilt tables + adds, nothing else."""
    y = jnp.zeros((idx9.shape[0], cout), jnp.float32)
    for g in range(9):
        y = y + jnp.take(
            tbl9[g], idx9[:, g], axis=0, mode="fill", fill_value=0
        ).astype(jnp.float32)
    return jnp.where(valid_out[:, None], y, 0.0)


def check_and_time_v2(name, cin, cout, level_i, iters=30):
    kmap = topo.k3_maps[level_i]
    lv = topo.levels[level_i]
    valid_l = lv.valid
    masks = jax.jit(zrun_masks_v2)(lv)
    M = kmap.shape[0]
    x = jnp.asarray(rng.randn(M, cin).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.05)

    y_ref = jax.jit(lambda x, w: sparse_ops.gather_conv(
        x, kmap, w, valid_l, kmap_bwd=kmap[:, ::-1]))(x, w)
    y_new = jax.jit(lambda x, w: zagg_conv_v2(x, kmap, w, valid_l, masks))(x, w)
    err = float(jnp.max(jnp.abs(y_ref - y_new)))
    scale = float(jnp.max(jnp.abs(y_ref))) + 1e-9
    print(f"{name}: max|diff|={err:.4f} (rel {err/scale:.2e})", flush=True)

    def timeit(label, fn):
        @jax.jit
        def chain(x, w, r):
            def body(_, acc):
                return jnp.sum(fn(x + acc * 1e-30, w))
            return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))
        _ = float(chain(x, w, 2))
        t0 = time.time()
        _ = float(chain(x, w, iters))
        dt = (time.time() - t0) / iters * 1e3
        print(f"  {label}: {dt:.2f} ms", flush=True)
        return dt

    a = timeit("gather27", lambda x, w: sparse_ops.gather_conv(
        x, kmap, w, valid_l, kmap_bwd=kmap[:, ::-1]))
    b = timeit("zagg9v2 ", lambda x, w: zagg_conv_v2(x, kmap, w, valid_l, masks))

    # floor: prebuilt tables, only the 9 gathers timed
    km3 = kmap.reshape(M, 9, 3)
    p0, p1, p2 = km3[:, :, 0] >= 0, km3[:, :, 1] >= 0, km3[:, :, 2] >= 0
    idx9 = jnp.where(p1, km3[:, :, 1],
                     jnp.where(p0, M + km3[:, :, 0],
                               jnp.where(p2, 2 * M + km3[:, :, 2], 3 * M)))
    tbl9 = jnp.asarray(rng.randn(9, 3 * M + 1, cout).astype(np.float32)).astype(BF)

    @jax.jit
    def chainf(t9, r):
        def body(_, acc):
            return jnp.sum(gather9_floor(t9 + acc * 1e-30, idx9, valid_l, cout))
        return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))
    _ = float(chainf(tbl9, 2))
    t0 = time.time()
    _ = float(chainf(tbl9, iters))
    dtf = (time.time() - t0) / iters * 1e3
    print(f"  floor9  : {dtf:.2f} ms  (build cost = {b - dtf:.2f})", flush=True)
    print(f"  speedup {a/b:.2f}x", flush=True)


if len(sys.argv) > 1 and sys.argv[1] == "v2":
    check_and_time_v2("v2 L0 k3 128->96", 128, 96, 0)
    check_and_time_v2("v2 L0 k3 96->96", 96, 96, 0)
    check_and_time_v2("v2 L1 k3 128->96", 128, 96, 1)
    check_and_time_v2("v2 L2 k3 192->128", 192, 128, 2)
    print("DONE v2", flush=True)
