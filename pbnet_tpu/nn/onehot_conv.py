"""Banded one-hot MXU gather-conv: sparse convolution without row gathers.

The gather-GEMM conv (sparse_ops.gather_conv) is issue-bound: every (output
voxel, kernel offset) pair costs one ~3-6 ns row gather, and the three UNets
spend most of their time issuing those gathers (PERF.md).  This kernel
removes them by exploiting the same monotone-locality that made per-group
gathers fast: within one (dx, dy) kernel-offset group, the input rows read
by TM consecutive outputs span a narrow contiguous band of the key-sorted
input level.  Per output tile the kernel

1. DMAs each group's band ``feats[start_g : start_g + SPAN]`` HBM -> VMEM
   (per-tile dynamic starts via scalar prefetch),
2. turns the gather into a one-hot matmul on the MXU:
   ``img2col_slot = onehot(rel_slot) @ band`` — a (TM, SPAN) x (SPAN, Cin)
   bf16 GEMM per kernel slot, with missing entries (-1 / out-of-band)
   mapping to all-zero one-hot rows, exactly the zero-row convention of
   sparse_ops._take_rows0 —
3. and applies the weights slot by slot, accumulating in f32.

MXU cost per gathered row is SPAN * Cin MACs ~ SPAN picoseconds — far below
the fixed gather-issue cost for the SPANs real topologies need (see
_scratch/micro_conv.py span statistics).  Entries outside their band (seen
at batch seams or pathological layouts) are DROPPED and counted in the
plan's ``overflow``, following the repo's static-capacity discipline; the
caller surfaces the count and sizes ``span`` accordingly.

Reference: this accelerates the same op as MinkowskiEngine's
gather-GEMM-scatter conv (/root/reference/network/Mink.py); the banded
one-hot formulation is original.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tests flip this to run through the Pallas interpreter on CPU.
INTERPRET = False

# One-hot needs enough input channels to feed MXU lanes: the band DMA and
# the one-hot GEMM both run at 128-lane granularity, so narrow-channel convs
# pay full freight for a fraction of the work and the gather path wins
# (measured v5e, real bench topology: 32ch L1 k3 3.51 one-hot vs 2.07
# gather; 64ch L2 1.56 vs 1.95-2.59; 128ch L1 3.58 vs 4.34).
MIN_CIN = 64


def enabled() -> bool:
    """True when the default backend lowers Pallas TPU kernels natively (or
    tests force the interpreter)."""
    if INTERPRET:
        return True
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


@flax.struct.dataclass
class OnehotPlan:
    """Per-map banding plan (see build_onehot_plan)."""

    starts: jnp.ndarray  # (n_tiles, G) int32 band start row, 16-aligned
    rel: jnp.ndarray  # (n_tiles, TM, K) int32 in-band offset; SPAN = absent
    overflow: jnp.ndarray  # () int32 present entries outside their band
    span: int = flax.struct.field(pytree_node=False)
    kz: int = flax.struct.field(pytree_node=False)
    m_in: int = flax.struct.field(pytree_node=False)


def build_onehot_plan(kmap: jnp.ndarray, kz: int, m_in: int,
                      tm: int = 256, span: int = 768) -> OnehotPlan | None:
    """Band each (dx, dy) offset group of ``kmap`` into per-tile windows.

    kmap: (M_out, K) int32 kernel map (-1 = missing), K = G * kz with dz
    enumerating fastest.  ``m_in`` is the input level's row count (band DMA
    bound).  Returns None when the shapes cannot band (M_out not a multiple
    of tm, or the input shorter than one band).
    """
    m_out, K = kmap.shape
    if m_out % tm != 0 or m_in < span or K % kz != 0:
        return None
    nt = m_out // tm
    G = K // kz
    km4 = kmap.reshape(nt, tm, G, kz)
    pres = km4 >= 0
    big = jnp.int32(2**30)
    mins = jnp.min(jnp.where(pres, km4, big), axis=(1, 3))  # (nt, G)
    start = jnp.where(mins < big, mins, 0)
    start = (start // 16) * 16  # bf16 sublane alignment
    # clip to an ALIGNED upper bound: m_in - span itself is only 16-aligned
    # when span % 16 == 0, and the kernel promises pl.multiple_of(start, 16)
    # to Mosaic — an unaligned clipped start would mean wrong DMA slices
    start = jnp.clip(start, 0, ((m_in - span) // 16) * 16)
    rel = km4 - start[:, None, :, None]
    ok = pres & (rel >= 0) & (rel < span)
    overflow = jnp.sum((pres & ~ok).astype(jnp.int32))
    rel = jnp.where(ok, rel, span).astype(jnp.int32).reshape(nt, tm, K)
    return OnehotPlan(starts=start.astype(jnp.int32), rel=rel,
                      overflow=overflow, span=span, kz=kz, m_in=m_in)


def reverse_plan(plan: OnehotPlan | None) -> OnehotPlan | None:
    """Plan for the column-reversed map (kmap[:, ::-1], the same-level
    backward map): reversal permutes groups and slots, so the banding is the
    column-reversed banding."""
    if plan is None:
        return None
    return plan.replace(starts=plan.starts[:, ::-1], rel=plan.rel[:, :, ::-1])


def attach_plans(topo, tm: int, spans) -> "object":
    """Build banding plans for a UNetTopology's k3/down/up maps.

    ``spans[l]`` is the k3 band span at level l (0 disables that level —
    e.g. where the band would be too wide relative to the channel count for
    the one-hot GEMM to win).  Down maps read the finer level and see ~2x
    the k3 span; up maps read the coarser level (~the coarser k3 span, kept
    at 2x for safety).  Maps below the plan's tiling floor (or shorter than
    one band) quietly skip — build_onehot_plan returns None.

    Returns the topology with plans + summed ``plan_overflow`` attached.
    """
    caps = [lv.hi.shape[0] for lv in topo.levels]
    n = len(topo.levels)
    spans = list(spans) + [0] * (n - len(spans))
    ovf = jnp.int32(0)

    def mk(kmap, kz, m_in, span):
        nonlocal ovf
        if not span:
            return None
        p = build_onehot_plan(kmap, kz, m_in, tm=tm, span=span)
        if p is not None:
            ovf = ovf + p.overflow
        return p

    k3 = tuple(
        mk(km, 3, caps[l], spans[l]) for l, km in enumerate(topo.k3_maps)
    )
    down = tuple(
        mk(km, 2, caps[l], 2 * spans[l])
        for l, km in enumerate(topo.down_maps)
    )
    up = tuple(
        mk(km, 2, caps[l + 1], 2 * spans[l + 1])
        for l, km in enumerate(topo.up_maps)
    )
    return topo.replace(
        k3_plans=k3, down_plans=down, up_plans=up,
        plan_overflow=topo.plan_overflow + ovf,
    )


def _kernel(span: int, kz: int, n_groups: int, cin: int,
            starts_ref, feats_hbm, rel_ref, w_ref, out_ref, band, sems):
    """One (TM, Cout) output tile: G band DMAs + K one-hot GEMMs.

    ``feats_hbm``/``band`` carry cin padded up to a 128-lane multiple —
    partial-lane DMA slices fail Mosaic's tiling alignment, and MXU cost is
    128-lane-granular anyway; the pad lanes are sliced off after the one-hot
    GEMM."""
    i = pl.program_id(0)
    tm = rel_ref.shape[1]
    cout = out_ref.shape[1]
    copies = [
        pltpu.make_async_copy(
            # starts are 16-aligned by construction (build_onehot_plan);
            # Mosaic needs the hint to prove the slice is tileable
            feats_hbm.at[pl.ds(pl.multiple_of(starts_ref[i, g], 16), span), :],
            band.at[g],
            sems.at[g],
        )
        for g in range(n_groups)
    ]
    for c in copies:
        c.start()
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (tm, span), 1)
    acc = jnp.zeros((tm, cout), jnp.float32)
    for g in range(n_groups):
        copies[g].wait()
        bg = band[g]  # (span, cin_padded)
        for k in range(kz):
            s = g * kz + k
            rel = rel_ref[0, :, s].reshape(tm, 1)
            oh = (iota_j == rel).astype(bg.dtype)
            gathered = jax.lax.dot_general(
                oh, bg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + jax.lax.dot_general(
                gathered[:, :cin].astype(bg.dtype), w_ref[s],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[:] = acc


def onehot_conv(feats: jnp.ndarray, plan: OnehotPlan, weights: jnp.ndarray,
                valid_out: jnp.ndarray, compute_dtype=jnp.bfloat16):
    """Sparse conv forward via banded one-hot MXU gathers.

    feats (M_in, Cin); weights (K, Cin, Cout); returns (M_out, Cout) f32.
    Semantics match sparse_ops._conv_fwd_math up to plan.overflow dropped
    entries (0 on healthy topologies; callers surface the counter).
    """
    nt, tm, K = plan.rel.shape
    G = K // plan.kz
    k_, cin, cout = weights.shape
    assert k_ == K, (k_, K)
    fb = feats.astype(compute_dtype)
    cin_p = -(-cin // 128) * 128  # full-lane DMA (see _kernel)
    if cin_p != cin:
        fb = jnp.pad(fb, ((0, 0), (0, cin_p - cin)))
    wb = weights.astype(compute_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            # HBM explicitly: under pl.ANY the compiler may place small
            # feature tables in VMEM, where partial-lane memref slices
            # (cin < 128) fail Mosaic's tiling alignment
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, tm, K), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, cout), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G, plan.span, cin_p), compute_dtype),
            pltpu.SemaphoreType.DMA((G,)),
        ],
    )
    y = pl.pallas_call(
        functools.partial(_kernel, plan.span, plan.kz, G, cin),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt * tm, cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nt * tm * plan.span * K * cin_p
            + 2 * nt * tm * K * cin * cout,
            transcendentals=0,
            bytes_accessed=nt * G * plan.span * cin_p * 2
            + plan.rel.size * 4 + nt * tm * cout * 4,
        ),
        interpret=INTERPRET,
    )(plan.starts, fb, plan.rel, wb)
    return jnp.where(valid_out[:, None], y, 0.0)
