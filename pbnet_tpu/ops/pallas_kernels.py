"""Pallas TPU kernels for the banded clustering passes.

The clustering propagation/border passes reduce per-point values over
bit-packed neighbor sets: for every row r of a (nchunks, chunk) tile and its
two banded windows, ``best[r] = reduce(values[j] for set bits j)``.  The
XLA formulation (ops/cluster.py bits_reduce) unrolls 32 bit-positions, each
re-reading the (nchunks, chunk, NW) word tensor from HBM — ~64 full passes
over the bit table per propagation round.  Here each window's words are read
into VMEM ONCE and all 32 bit-lanes are consumed in-register, so HBM traffic
per round drops from ~2 GB to ~the bit-table size (62 MB at the bench shapes).

Block layout: every operand keeps the grid dimension (nchunks) leading and
its trailing dims whole, satisfying the Mosaic rule that a block's last two
dims be full or (8, 128)-divisible.  Window values arrive pre-transposed as
(nchunks, 32, NW): vt[b, w] = window value at column w*32 + b, so bit-lane b
broadcasts a (NW,)-lane row — no in-kernel transpose.

No gradients flow through clustering (integer label algebra), so no VJP.
Reference semantics: min-label propagation of
/root/reference/lib/cluster/src/binary_cuda_functions.cu (BFS over the
radius graph); the banded-window formulation is original (SURVEY §2.5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF_I32 = jnp.iinfo(jnp.int32).max

# Tests flip this to run the kernels through the Pallas interpreter on CPU;
# the production TPU path leaves it False.
INTERPRET = False


def use_pallas() -> bool:
    """True when the default backend lowers Pallas TPU kernels natively."""
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover - backend probing never raises today
        return False


def _vt(vw, nw):
    """(nchunks, W) window values -> (nchunks, 32, NW) bit-lane-major."""
    return vw.reshape(vw.shape[0], nw, 32).swapaxes(1, 2)


def _reduce_kernel(minimize: bool, b1_ref, b2_ref, v1_ref, v2_ref, out_ref):
    """One (chunk,) row-tile: reduce window values over set neighbor bits.

    b*_ref: (1, chunk, NW) uint32 packed neighbor words (bit b of word w =
    window column w*32+b); v*_ref: (1, 32, NW) int32 bit-lane-major window
    values; out (1, 1, chunk).
    """
    chunk, nw = b1_ref.shape[1], b1_ref.shape[2]
    # identity elements mirror the XLA fallback (ops/cluster.py bits_reduce):
    # INF_I32 for label-min, -1 for first-orig-max
    init = INF_I32 if minimize else -1
    red = jnp.minimum if minimize else jnp.maximum
    acc = jnp.full((chunk, nw), init, jnp.int32)
    for b_ref, v_ref in ((b1_ref, v1_ref), (b2_ref, v2_ref)):
        bits = b_ref[0]  # (chunk, NW)
        vt = v_ref[0]  # (32, NW)
        for b in range(32):
            m = (bits >> jnp.uint32(b)) & jnp.uint32(1)
            cand = jnp.where(m > 0, vt[b : b + 1, :], init)
            acc = red(acc, cand)
    out = acc.min(axis=1) if minimize else acc.max(axis=1)
    out_ref[0, 0, :] = out


def masked_window_reduce(bits1, bits2, vw1, vw2, minimize: bool = True):
    """best[i, r] = reduce over {vw*[i, j] : bit j set in bits*[i, r]}.

    bits*: (nchunks, chunk, NW) uint32; vw*: (nchunks, W) int32 window
    values (W = NW*32).  Returns (nchunks, chunk) int32 — INF_I32 (min) or
    -1 (max) where no bits are set, matching the XLA fallback.
    """
    nchunks, chunk, nw = bits1.shape
    kern = functools.partial(_reduce_kernel, minimize)
    bspec = pl.BlockSpec((1, chunk, nw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, 32, nw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(nchunks,),
        in_specs=[bspec, bspec, vspec, vspec],
        out_specs=pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nchunks, 1, chunk), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 32 * 4 * chunk * nw * nchunks, transcendentals=0,
            bytes_accessed=2 * bits1.size * 4 + 2 * vw1.size * 4,
        ),
        interpret=INTERPRET,
    )(bits1, bits2, _vt(vw1, nw), _vt(vw2, nw))
    return out[:, 0, :]


def _neighbor_pack_kernel(r2_ref, rows_f_ref, rows_i_ref, w1f_ref, w1i_ref,
                          w2f_ref, w2i_ref, b1_ref, b2_ref, dens_ref):
    """Fused neighbor mask + bit-pack + density for one (chunk,) row tile.

    rows_f: (1, 3, chunk) f32 row xyz; rows_i: (1, 3, chunk) int32
    (group, valid, global sorted index).  w*f: (1, 3, 32, NW) f32 window xyz
    bit-lane-major (lane b, word w = window column w*32+b); w*i:
    (1, 3, 32, NW) int32 (group, validity incl. fresh-column mask, global
    sorted index).  Outputs: packed neighbor words (1, chunk, NW) uint32 per
    window plus density (1, 1, chunk) int32 = popcount over both windows.
    """
    chunk = rows_f_ref.shape[2]
    nw = w1f_ref.shape[3]
    r2 = r2_ref[0]
    rx = rows_f_ref[0, 0, :].reshape(chunk, 1)
    ry = rows_f_ref[0, 1, :].reshape(chunk, 1)
    rz = rows_f_ref[0, 2, :].reshape(chunk, 1)
    rg = rows_i_ref[0, 0, :].reshape(chunk, 1)
    rv = rows_i_ref[0, 1, :].reshape(chunk, 1)
    ridx = rows_i_ref[0, 2, :].reshape(chunk, 1)
    cnt = jnp.zeros((chunk, nw), jnp.int32)
    for wf_ref, wi_ref, out_ref in ((w1f_ref, w1i_ref, b1_ref),
                                    (w2f_ref, w2i_ref, b2_ref)):
        wf = wf_ref[0]  # (3, 32, NW)
        wi = wi_ref[0]
        word = jnp.zeros((chunk, nw), jnp.uint32)
        for b in range(32):
            dx = rx - wf[0, b:b + 1, :]
            dy = ry - wf[1, b:b + 1, :]
            dz = rz - wf[2, b:b + 1, :]
            d2 = dx * dx + dy * dy + dz * dz
            m = (
                (d2 <= r2)
                & (rg == wi[0, b:b + 1, :])
                & (wi[1, b:b + 1, :] > 0)
                & (rv > 0)
                & (ridx != wi[2, b:b + 1, :])
            )
            mi = m.astype(jnp.uint32)
            word = word | (mi << jnp.uint32(b))
            cnt = cnt + mi.astype(jnp.int32)
        out_ref[0] = word
    dens_ref[0, 0, :] = cnt.sum(axis=1)


def neighbor_pack(r2, rows_f, rows_i, w1f, w1i, w2f, w2i):
    """Packed neighbor bit-words + density for the dual banded windows.

    rows_f: (nchunks, 3, chunk) f32; rows_i: (nchunks, 3, chunk) int32
    (group, valid, global index); w*f: (nchunks, 3, 32, NW) f32 and w*i:
    (nchunks, 3, 32, NW) int32 window planes, bit-lane-major.  Returns
    (bits1, bits2, density): 2 x (nchunks, chunk, NW) uint32 + (nchunks,
    chunk) int32 — bit b of word w = window column w*32 + b, matching
    ops/cluster.py pack_w.
    """
    nchunks, _, chunk = rows_f.shape
    nw = w1f.shape[3]
    rspec = pl.BlockSpec((1, 3, chunk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((1, 3, 32, nw), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, chunk, nw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    bits1, bits2, dens = pl.pallas_call(
        _neighbor_pack_kernel,
        grid=(nchunks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  rspec, rspec, wspec, wspec, wspec, wspec],
        out_specs=[bspec, bspec,
                   pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((nchunks, chunk, nw), jnp.uint32),
            jax.ShapeDtypeStruct((nchunks, chunk, nw), jnp.uint32),
            jax.ShapeDtypeStruct((nchunks, 1, chunk), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 32 * 12 * chunk * nw * nchunks, transcendentals=0,
            bytes_accessed=(2 * chunk * nw * 4 + 8 * 32 * nw * 4) * nchunks,
        ),
        interpret=INTERPRET,
    )(jnp.asarray(r2, jnp.float32).reshape(1), rows_f, rows_i,
      w1f, w1i, w2f, w2i)
    return bits1, bits2, dens[:, 0, :]


def _window_1nn_kernel(need_ref, rows_f_ref, rows_i_ref, wf_ref, wi_ref,
                       d2_ref, col_ref):
    """Masked nearest-candidate search over one banded window.

    Per row r: over window columns c with (candidate assigned-mask set and
    group match), minimize d2; among minima the LAST window column wins
    (the reference's ``dist <= best`` scan order).  Outputs best d2
    (inf when empty) and the winning window column (1, 1, chunk).

    ``need_ref`` (scalar prefetch, (nchunks,)): chunks with NO needy rows
    skip the whole 32-bit scan and emit the empty answer — on trained/
    oracle content only a few % of rows reach the 1-NN fallback, so most
    chunks skip.
    """
    i = pl.program_id(0)
    chunk = rows_f_ref.shape[2]
    nw = wf_ref.shape[3]

    @pl.when(need_ref[i] == 0)
    def _():
        d2_ref[0, 0, :] = jnp.full((chunk,), jnp.inf, jnp.float32)
        col_ref[0, 0, :] = jnp.full((chunk,), -1, jnp.int32)

    @pl.when(need_ref[i] > 0)
    def _():
        rx = rows_f_ref[0, 0, :].reshape(chunk, 1)
        ry = rows_f_ref[0, 1, :].reshape(chunk, 1)
        rz = rows_f_ref[0, 2, :].reshape(chunk, 1)
        rg = rows_i_ref[0, 0, :].reshape(chunk, 1)
        wf = wf_ref[0]
        wi = wi_ref[0]
        inf = jnp.float32(jnp.inf)
        best = jnp.full((chunk, nw), inf, jnp.float32)
        bestb = jnp.zeros((chunk, nw), jnp.int32)
        for b in range(32):
            dx = rx - wf[0, b:b + 1, :]
            dy = ry - wf[1, b:b + 1, :]
            dz = rz - wf[2, b:b + 1, :]
            d2 = dx * dx + dy * dy + dz * dz
            ok = (rg == wi[0, b:b + 1, :]) & (wi[1, b:b + 1, :] > 0)
            d2 = jnp.where(ok, d2, inf)
            # later bit lane wins ties within a word lane (<=)
            take = d2 <= best
            best = jnp.where(take, d2, best)
            bestb = jnp.where(take, b, bestb)
        # across word lanes: the LARGEST w among minima wins (later window
        # column), then its stored bit lane
        mind2 = best.min(axis=1, keepdims=True)  # (chunk, 1)
        wlane = jax.lax.broadcasted_iota(jnp.int32, (chunk, nw), 1)
        wpick = jnp.where(best <= mind2, wlane, -1).max(axis=1)  # (chunk,)
        bpick = jnp.where(wlane == wpick[:, None], bestb, -1).max(axis=1)
        d2_ref[0, 0, :] = mind2[:, 0]
        col_ref[0, 0, :] = wpick * 32 + bpick


def window_1nn(rows_f, rows_i, wf, wi, need=None):
    """Banded masked 1-NN: best squared distance + window column per row.

    rows_f: (nchunks, 3, chunk) f32 query xyz; rows_i: (nchunks, 3, chunk)
    int32 (group, _, _); wf/wi: (nchunks, 3, 32, NW) bit-lane-major window
    planes (xyz / group, candidate mask, unused).  ``need``: (nchunks,)
    int32 needy-row count per chunk (None = all needy).  Returns (d2, col):
    (nchunks, chunk) f32 best distance (inf if no candidate, or the chunk
    skipped) and int32 window column (w*32+b) of the LAST minimum in window
    order (-1 for skipped chunks).
    """
    nchunks, _, chunk = rows_f.shape
    nw = wf.shape[3]
    if need is None:
        need = jnp.ones((nchunks,), jnp.int32)
    rspec = pl.BlockSpec((1, 3, chunk), lambda i, n: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((1, 3, 32, nw), lambda i, n: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 1, chunk), lambda i, n: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[rspec, rspec, wspec, wspec],
        out_specs=[ospec, ospec],
    )
    d2, col = pl.pallas_call(
        _window_1nn_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nchunks, 1, chunk), jnp.float32),
            jax.ShapeDtypeStruct((nchunks, 1, chunk), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=32 * 12 * chunk * nw * nchunks, transcendentals=0,
            bytes_accessed=(chunk * nw * 4 + 8 * 32 * nw * 4) * nchunks,
        ),
        interpret=INTERPRET,
    )(need.astype(jnp.int32), rows_f, rows_i, wf, wi)
    return d2[:, 0, :], col[:, 0, :]


def _border_kernel(b1_ref, b2_ref, f1_ref, f2_ref, l1_ref, l2_ref,
                   best_ref, root_ref):
    """Fused border adoption: ONE pass over the packed neighbor words
    computes both the max first-orig value over set bits AND the label of
    a root achieving it (the two-pass formulation reads the 62 MB bit
    tables twice; equal first-orig values imply the identical component, so
    tracking the argmax's label inline is exact)."""
    chunk, nw = b1_ref.shape[1], b1_ref.shape[2]
    # two sequential SINGLE-accumulator loops (a dual-accumulator take/
    # select chain made Mosaic keep every iteration's intermediates live:
    # 67 MB scoped-vmem OOM); the bit words and value planes stay VMEM-
    # resident across both, which is the fusion win
    best = jnp.full((chunk, nw), -1, jnp.int32)
    for b_ref, f_ref in ((b1_ref, f1_ref), (b2_ref, f2_ref)):
        bits = b_ref[0]
        ft = f_ref[0]  # (32, NW)
        for b in range(32):
            m = (bits >> jnp.uint32(b)) & jnp.uint32(1)
            best = jnp.maximum(best, jnp.where(m > 0, ft[b : b + 1, :], -1))
    mx = best.max(axis=1)  # (chunk,)
    # any entry whose first-orig equals the max holds a root of THE
    # component (first-orig is injective across components)
    acc = jnp.full((chunk, nw), -1, jnp.int32)
    for b_ref, f_ref, l_ref in ((b1_ref, f1_ref, l1_ref),
                                (b2_ref, f2_ref, l2_ref)):
        bits = b_ref[0]
        ft = f_ref[0]
        lt = l_ref[0]
        for b in range(32):
            m = (bits >> jnp.uint32(b)) & jnp.uint32(1)
            hit = (m > 0) & (ft[b : b + 1, :] == mx[:, None])
            acc = jnp.maximum(acc, jnp.where(hit, lt[b : b + 1, :], -1))
    best_ref[0, 0, :] = mx
    root_ref[0, 0, :] = acc.max(axis=1)


def masked_window_border(bits1, bits2, fw1, fw2, lw1, lw2):
    """Fused equivalent of masked_window_reduce(..., maximize) +
    masked_window_match_pick: returns (best_first, root_pick), both
    (nchunks, chunk) int32 with -1 where no bits are set.

    The row dimension is sub-tiled (grid dim 1): the kernel's 128 unrolled
    bit iterations made Mosaic stack full-chunk intermediates (35-67 MB of
    scoped vmem at chunk=1024); 256-row tiles keep the live set bounded
    while the (per-chunk) value planes are re-fetched per sub-tile (cheap:
    they are 32 x NW)."""
    nchunks, chunk, nw = bits1.shape
    sub = min(chunk, 256)
    nsub = chunk // sub
    assert nsub * sub == chunk, (chunk, sub)
    bspec = pl.BlockSpec((1, sub, nw), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, 32, nw), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 1, sub), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    best, root = pl.pallas_call(
        _border_kernel,
        grid=(nchunks, nsub),
        in_specs=[bspec, bspec, vspec, vspec, vspec, vspec],
        out_specs=[ospec, ospec],
        out_shape=[
            jax.ShapeDtypeStruct((nchunks, 1, chunk), jnp.int32),
            jax.ShapeDtypeStruct((nchunks, 1, chunk), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 32 * 6 * chunk * nw * nchunks, transcendentals=0,
            bytes_accessed=2 * bits1.size * 4 + 4 * fw1.size * 4,
        ),
        interpret=INTERPRET,
    )(bits1, bits2, _vt(fw1, nw), _vt(fw2, nw), _vt(lw1, nw), _vt(lw2, nw))
    return best[:, 0, :], root[:, 0, :]


def _match_pick_kernel(b1_ref, b2_ref, f1_ref, f2_ref, l1_ref, l2_ref,
                       tgt_ref, out_ref):
    """Border-adoption pick: max of label values over set bits whose
    first-orig value equals the row's target (ops/cluster.py root_pick)."""
    chunk, nw = b1_ref.shape[1], b1_ref.shape[2]
    tgt = tgt_ref[0, 0]  # (chunk,)
    acc = jnp.full((chunk, nw), -1, jnp.int32)
    for b_ref, f_ref, l_ref in ((b1_ref, f1_ref, l1_ref),
                                (b2_ref, f2_ref, l2_ref)):
        bits = b_ref[0]
        ft = f_ref[0]  # (32, NW)
        lt = l_ref[0]
        for b in range(32):
            m = (bits >> jnp.uint32(b)) & jnp.uint32(1)
            hit = (m > 0) & (ft[b : b + 1, :] == tgt[:, None])
            acc = jnp.maximum(acc, jnp.where(hit, lt[b : b + 1, :], -1))
    out_ref[0, 0, :] = acc.max(axis=1)


def masked_window_match_pick(bits1, bits2, fw1, fw2, lw1, lw2, target):
    """out[i, r] = max over {lw*[i, j] : bit j set and fw*[i, j] == target[i, r]}
    (-1 where empty).  Shapes as masked_window_reduce; target (nchunks, chunk)."""
    nchunks, chunk, nw = bits1.shape
    bspec = pl.BlockSpec((1, chunk, nw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, 32, nw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _match_pick_kernel,
        grid=(nchunks,),
        in_specs=[bspec, bspec, vspec, vspec, vspec, vspec, rspec],
        out_specs=rspec,
        out_shape=jax.ShapeDtypeStruct((nchunks, 1, chunk), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 32 * 5 * chunk * nw * nchunks, transcendentals=0,
            bytes_accessed=2 * bits1.size * 4 + 4 * fw1.size * 4,
        ),
        interpret=INTERPRET,
    )(bits1, bits2, _vt(fw1, nw), _vt(fw2, nw), _vt(lw1, nw), _vt(lw2, nw),
      target[:, None, :])
    return out[:, 0, :]
