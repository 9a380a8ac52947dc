"""Functional sparse-tensor ops: gather-GEMM convolution, pooling.

The convolution formulation is TPU-first: a kernel map (see core/topology.py)
turns sparse convolution into ``gather -> one big GEMM`` with *uniform* static
shapes — no scatter, because each (output voxel, kernel offset) pair has at
most one input voxel.  The GEMM is ``(M, K*Cin) @ (K*Cin, Cout)``, which XLA
tiles straight onto the MXU.  This replaces MinkowskiEngine's
gather-GEMM-scatter sparse conv used throughout the reference
(/root/reference/network/Mink.py).
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp


# Conv compute dtype: bf16 img2col + weights with f32 accumulation halves the
# dominant HBM traffic (the (M, K, Cin) gather buffer) at matmul-standard
# precision.  Flip to jnp.float32 for strict-parity comparisons.
COMPUTE_DTYPE = jnp.bfloat16


def _take_rows0(tbl, idx):
    """Row gather where ANY out-of-range index (including -1 "missing")
    yields a zero row.  ``jnp.take(mode="fill")`` alone is NOT enough: JAX
    wraps negative indices even in fill mode, so a -1 kernel-map entry would
    silently read the LAST row — real data whenever a level runs at exactly
    full capacity.  Remapping -1 above the table length makes it genuinely
    out of range.

    2-D index arrays (kernel maps) are gathered COLUMN BY COLUMN: for a fixed
    kernel offset the map column is monotone increasing where present (voxels
    are key-sorted; adding a constant offset preserves lexicographic order),
    and monotone-index gathers measure ~30% faster than one interleaved
    gather of the whole map (v5e, _scratch/micro_sorted.py)."""
    safe = jnp.where(idx >= 0, idx, jnp.int32(tbl.shape[0]))
    if idx.ndim == 2 and idx.shape[1] > 1:
        cols = [
            jnp.take(tbl, safe[:, k], axis=0, mode="fill", fill_value=0)
            for k in range(idx.shape[1])
        ]
        return jnp.stack(cols, axis=1)
    return jnp.take(tbl, safe, axis=0, mode="fill", fill_value=0)


def _window_plan(kz, cin):
    """Rows per window gather.  A gather op fetches up to one 128-lane tile
    at roughly fixed cost (measured on v5e: ~3-6 ns/op whether the row is 64
    or 192 bytes), so windows pay off when ``w * cin <= 128`` with
    ``w >= 2``.  Exception (measured r4, real L1 topology): when a 192-lane
    budget lets the window cover the WHOLE z-run (w == kz, single gather per
    group, m-major single-chunk reconstruction), the wider rows win big
    (64ch k3: 3.81 vs 7.23 ms at 45k voxels) — the chunk loop + selects of
    the partial-window path cost more than the extra row tile.  Wider rows
    WITHOUT full coverage still lose (96ch w=2: 18.97 vs 7.89 ms).
    Re-measured r5 for the intermediate kz=5 cin=34 combo (the D_Unet stem,
    170-lane 2-tile rows): full coverage w=5 11.9 ms vs w=3 21.6 / w=2 25.5
    at 45k rows — the full-coverage exception holds there too
    (perf/micro_kz5.py)."""
    if kz is None or kz <= 1:
        return None
    w = min(kz, max(1, 128 // max(cin, 1)))
    if w < kz and kz * cin <= 192:
        return kz  # full z-run in one <=192-lane gather
    return w if w >= 2 else None


def _window_img2col(feats, kmap, kz, w):
    """img2col via z-window row gathers: ceil(kz/w) gathers per (dx, dy)
    group instead of kz scalar gathers.

    Kernel offsets enumerate dz fastest, so each aligned kz-column block of
    the kernel map shares one (dx, dy) column of the voxel lattice.  Present
    members of any CONTIGUOUS dz sub-range occupy CONSECUTIVE rows of the
    (key-sorted) input level (rank order == key order within a z-column; the
    lattice has no voxels between adjacent dz candidates).  So ONE row gather
    of a w-stacked feature table at the sub-block's min index fetches every
    member, and a cheap (pos == t) select rebuilds the per-slot layout.
    ``w`` (from :func:`_window_plan`) keeps each gathered row within one
    128-lane tile — the regime where gathers are op-count-bound.

    Also correct for column-reversed maps (kmap_bwd = kmap[:, ::-1]):
    reversal maps aligned blocks to aligned blocks and the reconstruction
    never assumes dz is ascending.

    Two reconstruction layouts, picked by measured crossover (v5e):

    * m-major: the gathered window reshapes to (m, G, w, cin) and ONE select
      per window slot builds all cw output slots at once.  Wins when rows are
      narrow (cin <= 32 pads an (m*G, cin) buffer to a mostly-empty 128-lane
      tile) or the chunk covers the whole z-run (w == kz: no chunk loop).
      Measured: stem (cin=6, w=5) 18.3 -> 4.7 ms at 98k voxels.
    * slot-major: strictly 2-D (m*G, cin) accumulation per output slot.
      Wins for wide rows with short windows (cin=34 w=3: 6.8 vs 8.8 ms;
      cin=64 w=2: 3.1 vs 3.2 ms).

    The GATHER itself always stays 2-D ((m,) anchors into the w-stacked
    table): 3-D/4-D gather operands made XLA pick transposed layouts and
    insert data-formatting copies that dwarfed the gathers themselves
    (profiled: 90 ms for a 3.3M-row window gather that costs ~5 ms in 2-D).

    Anchors are gathered ONE (dx, dy) GROUP AT A TIME, not as one (m*G,)
    interleaved gather: a group's anchors are monotone increasing where
    present (key-sorted voxels + constant offset), and monotone-index row
    gathers measure 2.7x faster than the interleaved equivalent on v5e
    (_scratch/micro_sorted2.py: k3 cin=32 16.5 -> 5.9 ms, cin=64
    17.6 -> 6.5 ms at 98k voxels).
    """
    m, K = kmap.shape
    cin = feats.shape[1]
    G = K // kz
    assert G * kz == K, (K, kz)
    mmajor = w == kz or cin <= 32
    f = feats.astype(COMPUTE_DTYPE)
    # stacked table: fS[a] = [f[a], f[a+1], ..., f[a+w-1]]  (zero pad at end)
    parts = [f]
    for t in range(1, w):
        parts.append(
            jnp.concatenate([f[t:], jnp.zeros((t, cin), f.dtype)], axis=0)
        )
    fS = jnp.concatenate(parts, axis=1)  # (M_in, w*Cin)

    km3 = kmap.reshape(m, G, kz)
    big = jnp.int32(2**30)
    chunks = []
    for c0 in range(0, kz, w):
        cw = min(w, kz - c0)
        blk3 = km3[:, :, c0 : c0 + cw]  # (m, G, cw)
        pres3 = blk3 >= 0
        if cw == 1:
            g_parts = []
            for g in range(G):
                idx = jnp.where(pres3[:, g, 0], blk3[:, g, 0], 0)
                g_parts.append(jnp.where(
                    pres3[:, g], jnp.take(f, idx, axis=0, mode="clip"), 0
                ))
            g1 = jnp.stack(g_parts, axis=1)  # (m, G, cin)
            chunks.append(
                g1.reshape(m, G, 1, cin) if mmajor
                else g1.reshape(m * G, cin)
            )
            continue
        anchor = jnp.min(jnp.where(pres3, blk3, big), axis=2)  # (m, G)
        anchor_c = jnp.where(anchor < big, anchor, 0)
        wins = [
            jnp.take(fS, anchor_c[:, g], axis=0, mode="clip")
            for g in range(G)
        ]
        win3 = jnp.stack(wins, axis=1)  # (m, G, w*cin)
        pos3 = blk3 - anchor_c[:, :, None]  # (m, G, cw) window pos per slot
        if mmajor:
            win4 = win3.reshape(m, G, w, cin)
            out = jnp.zeros((m, G, cw, cin), f.dtype)
            for s in range(w):
                out = out + jnp.where(
                    (pres3 & (pos3 == s))[..., None],
                    win4[:, :, s : s + 1, :], 0,
                )
            chunks.append(out)  # (m, G, cw, cin)
            continue
        win2 = win3.reshape(m * G, w * cin)
        pos = pos3.reshape(m * G, cw)
        present = pres3.reshape(m * G, cw)
        outs = []
        for ti in range(cw):
            sel = jnp.zeros((m * G, cin), f.dtype)
            hit = present[:, ti]
            pt = pos[:, ti]
            for s in range(w):
                sel = sel + jnp.where(
                    (hit & (pt == s))[:, None],
                    win2[:, s * cin : (s + 1) * cin], 0,
                )
            outs.append(sel)
        chunks.append(jnp.concatenate(outs, axis=1))  # (mG, cw*cin)
    ax = 2 if mmajor else 1
    g = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=ax)
    return g.reshape(m, K * cin)  # row layout == (G, kz, cin) flattened


def zrun_masks(coords4, valid, stride):
    """Per-row z-adjacency of a key-sorted level: is row j-1 / j+1 the same
    (batch/pid, x, y) column's z -/+ stride voxel?  Rank order == key order,
    so z-adjacent present voxels occupy consecutive rows.  Feeds the
    center-group shift aggregation in :func:`gather_conv` (``zmasks``)."""
    bxy = coords4[:, :3]
    z = coords4[:, 3]
    same = jnp.all(bxy[1:] == bxy[:-1], axis=1) & valid[1:] & valid[:-1]
    step = (z[1:] - z[:-1]) == stride
    adj = same & step
    pad = jnp.zeros((1,), bool)
    prev_ok = jnp.concatenate([pad, adj])
    next_ok = jnp.concatenate([adj, pad])
    return prev_ok, next_ok


def _shift_dn(a):
    return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)


def _shift_up(a):
    return jnp.concatenate([a[1:], jnp.zeros_like(a[:1])], axis=0)


def _center_group_contrib(feats, kmap_center, w_center, zmasks):
    """Same-level k3 center (dx,dy)=(0,0) group WITHOUT gathers.

    The center column of a same-level k3 map is the identity (offset 0 ->
    the output voxel itself) and the dz=+-1 columns are the adjacent ROWS of
    the key-sorted level where z-adjacent (zrun_masks) — so this group's
    contribution is two masked row-shifts + three GEMMs, removing 3 of 27
    gather columns (~11% of the conv's gather ops) at ~zero cost.

    Terms are ALSO masked by the map columns' own presence bits
    (``kmap_center``, the 3 center columns): under grid-extent overflow a
    map entry can be -1 even though the voxel exists in the level, and the
    fast path must drop exactly what the gather path would."""
    prev_ok, next_ok = zmasks
    p0 = prev_ok & (kmap_center[:, 0] >= 0)
    p1 = kmap_center[:, 1] >= 0
    p2 = next_ok & (kmap_center[:, 2] >= 0)
    xB = feats.astype(COMPUTE_DTYPE)
    wB = w_center.astype(COMPUTE_DTYPE)  # (3, cin, cout): dz -1, 0, +1
    xp = jnp.where(p0[:, None], _shift_dn(xB), 0)
    xc = jnp.where(p1[:, None], xB, 0)
    xn = jnp.where(p2[:, None], _shift_up(xB), 0)

    def mm(a, w):
        return jax.lax.dot_general(
            a, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return mm(xp, wB[0]) + mm(xc, wB[1]) + mm(xn, wB[2])


def _single_present_img2col(feats, kmap, weights):
    """Up-conv (k=2 s=2 transpose) fast path: every output row has AT MOST
    ONE present kernel-map entry (each fine voxel has exactly one coarse
    parent at one offset — up_map_direct/invert_map geometry), so the 8
    per-column gathers collapse to ONE gather of a pre-applied-weight table:
    z = x @ [W_0 | ... | W_7], y[o] = z[parent_o, slot d_o].
    """
    k, cin, cout = weights.shape
    x = feats.astype(COMPUTE_DTYPE)
    wcat = jnp.transpose(weights.astype(COMPUTE_DTYPE), (1, 0, 2)).reshape(
        cin, k * cout
    )
    # keep f32: rounding the per-offset products to bf16 BEFORE the gather
    # would add a second rounding step the img2col path doesn't have
    z = jax.lax.dot_general(
        x, wcat, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(feats.shape[0] * k, cout)
    present = kmap >= 0
    d = jnp.argmax(present, axis=1).astype(jnp.int32)
    parent = jnp.take_along_axis(kmap, d[:, None], axis=1)[:, 0]
    idx = jnp.where(jnp.any(present, axis=1), parent * k + d, -1)
    return _take_rows0(z, idx).astype(jnp.float32)


def _conv_fwd_math(feats, kmap, weights, valid_out, kz=None, zmasks=None,
                   single_present=False):
    k, cin, cout = weights.shape
    if single_present:
        y = _single_present_img2col(feats, kmap, weights)
        return jnp.where(valid_out[:, None], y, 0.0)
    y_center = None
    if zmasks is not None and k == 27 and kz == 3 \
            and kmap.shape[0] == feats.shape[0]:
        y_center = _center_group_contrib(
            feats, kmap[:, 12:15], weights[12:15], zmasks
        )
        kmap = jnp.concatenate([kmap[:, :12], kmap[:, 15:]], axis=1)
        weights = jnp.concatenate([weights[:12], weights[15:]], axis=0)
        k = 24
    w = _window_plan(kz, cin)
    if w is not None:
        g = _window_img2col(feats, kmap, kz, w)
    else:
        g = _take_rows0(
            feats.astype(COMPUTE_DTYPE), kmap
        ).reshape(kmap.shape[0], k * cin)
    y = jax.lax.dot_general(
        g,
        weights.astype(COMPUTE_DTYPE).reshape(k * cin, cout),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if y_center is not None:
        y = y + y_center
    return jnp.where(valid_out[:, None], y, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_conv_core(meta, feats, kmap, kmap_bwd, weights, valid_out,
                      zprev, znext):
    """Sparse conv whose BACKWARD is also a gather-GEMM.

    XLA differentiates a gather into a scatter-add, and random scatters run
    at ~54M elements/s on v5e — conv backwards dominated the train step
    (86 s/step before this).  But every kernel map's transpose IS another
    kernel map: output i reads input j at offset d  <=>  input j is read by
    output at coordinate (j - d).  ``kmap_bwd[j, k]`` must hold the output
    row that reads input j at forward-offset k:

    * same-level (odd-k) maps: the column-reversed map itself (-d enumerates
      at index K-1-k)
    * strided conv (k=2 s=2): the transpose-conv map of the same level pair
    * transposed conv: the strided-conv map

    so no extra lookups are ever built.  ``meta`` (static) is
    ``(kz, single_present, has_zmasks)``: kz enables z-window gathers in
    both directions (_window_img2col); the flags pick the up-conv
    single-present and center-group shift fast paths (forward only — the
    hand-written backward is exact for the linear map regardless of which
    forward formulation ran).  ``zprev``/``znext`` are the zrun_masks arrays
    (dummies when has_zmasks is False).
    """
    kz, single_present, has_zmasks = meta
    return _conv_fwd_math(
        feats, kmap, weights, valid_out, kz,
        zmasks=(zprev, znext) if has_zmasks else None,
        single_present=single_present,
    )


def _gc_fwd(meta, feats, kmap, kmap_bwd, weights, valid_out, zprev, znext):
    kz, single_present, has_zmasks = meta
    y = _conv_fwd_math(
        feats, kmap, weights, valid_out, kz,
        zmasks=(zprev, znext) if has_zmasks else None,
        single_present=single_present,
    )
    return y, (feats, kmap, kmap_bwd, weights, valid_out)


def _gc_bwd(meta, res, dy):
    kz = meta[0]
    feats, kmap, kmap_bwd, weights, valid_out = res
    dy = jnp.where(valid_out[:, None], dy, 0.0).astype(COMPUTE_DTYPE)
    k, cin, cout = weights.shape
    # One backward gather serves BOTH grads: gy[j,k] = dy[output reading j at
    # forward-offset k].
    wq = _window_plan(kz, cout)
    if wq is not None:
        gy = _window_img2col(dy, kmap_bwd, kz, wq).reshape(
            kmap_bwd.shape[0], k, cout
        )
    else:
        gy = _take_rows0(dy, kmap_bwd)  # (Min, K, Cout)
    # dx[j] = sum_k gy[j,k] @ W[k]^T
    wt = jnp.swapaxes(weights.astype(COMPUTE_DTYPE), 1, 2).reshape(k * cout, cin)
    dx = jax.lax.dot_general(
        gy.reshape(gy.shape[0], k * cout), wt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dW[k] = sum_i x[kmap[i,k]] dy[i] = sum_j x[j] gy[j,k]  (substituting
    # j = kmap[i,k] <=> i = kmap_bwd[j,k]) — no re-gather of x needed.
    dw = jax.lax.dot_general(
        feats.astype(COMPUTE_DTYPE), gy.reshape(gy.shape[0], k * cout),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(cin, k, cout).transpose(1, 0, 2)
    return dx, None, None, dw, None, None, None


_gather_conv_core.defvjp(_gc_fwd, _gc_bwd)

# hypercube kernel volume -> z-run length (offsets enumerate dz fastest)
_KZ_OF = {125: 5, 27: 3, 8: 2}


def gather_conv(
    feats: jnp.ndarray,  # (M_in, Cin)
    kmap: jnp.ndarray,  # (M_out, K) int32, -1 = missing input
    weights: jnp.ndarray,  # (K, Cin, Cout)
    valid_out: jnp.ndarray,  # (M_out,) bool
    bias: jnp.ndarray | None = None,
    kmap_bwd: jnp.ndarray | None = None,
    plan=None,  # onehot_conv.OnehotPlan: banded one-hot MXU path (eval-only
    # today: the Pallas kernel has no VJP, so callers pass it when no
    # gradient will flow — minkunet gates on ``train``)
    zmasks=None,  # (prev_ok, next_ok) from zrun_masks — SAME-LEVEL k3 convs
    # only (caller contract: kmap rows == level rows, kmap_bwd is the column
    # flip): gathers the center (dx,dy)=(0,0) group by row shifts instead
    single_present: bool = False,  # up-conv maps (<=1 present entry per row,
    # up_map_direct/invert_map k2s2 geometry): ONE gather replaces K
) -> jnp.ndarray:
    """Sparse convolution as gather + GEMM.  Returns (M_out, Cout).

    When ``kmap_bwd`` is given, the backward pass is a gather-GEMM too (see
    ``_gather_conv_core``); otherwise autodiff falls back to scatter-add.
    Hypercube kernel maps use z-window gathers (see _window_img2col).
    """
    from . import onehot_conv as _oc

    kz = _KZ_OF.get(kmap.shape[1])
    use_zm = (zmasks is not None and kmap.shape[1] == 27 and kz == 3
              and kmap.shape[0] == feats.shape[0])
    if (plan is not None and _oc.enabled()
            and feats.shape[1] >= _oc.MIN_CIN):
        y = _oc.onehot_conv(feats, plan, weights, valid_out, COMPUTE_DTYPE)
    elif kmap_bwd is None:
        y = _conv_fwd_math(feats, kmap, weights, valid_out, kz,
                           zmasks=zmasks if use_zm else None,
                           single_present=single_present)
    else:
        dummy = jnp.zeros((1,), bool)
        zprev, znext = zmasks if use_zm else (dummy, dummy)
        y = _gather_conv_core(
            (kz, bool(single_present), use_zm),
            feats, kmap, kmap_bwd, weights, valid_out, zprev, znext,
        )
    if bias is not None:
        y = jnp.where(valid_out[:, None], y + bias, 0.0)
    return y


# ---------------------------------------------------------------------------
# Dense-grid convolution for COARSE levels.
#
# The sparse gather-GEMM pays ~K gather ops per output voxel; at coarse UNet
# levels (small dense extents, e.g. 64x64x40 at stride 4 of a single ScanNet
# scene) the dense grid is tiny and MXU conv FLOPs are nearly free, so
# scatter -> dense conv -> gather removes the gather wall entirely.  The
# stride-2 down/up convs become pure reshape+GEMM (each output cell reads a
# disjoint 2x2x2 block).  NOT used at fine levels: a 256^3 L0 grid is 10.5M
# cells at ~1% occupancy and loses (measured end-to-end, PERF.md r2).
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class DensePlan:
    """Static geometry + per-voxel cell indices for a dense-grid conv.

    ``in_idx`` / ``out_idx`` hold each voxel row's flat cell index in the
    (B, X, Y, Z) grid of its level, with invalid rows pointing at the dummy
    cell ``prod(dims)`` (scattered values land on a discarded row; gathers
    read an appended zero row).  ``mode``:

    * ``same``: k=3 stride-1 conv, in/out on one level
    * ``down``: k=2 s=2 conv, fine -> coarse (dims_out = ceil(dims_in / 2))
    * ``up``:   k=2 s=2 transposed conv, coarse -> fine
    """

    in_idx: jnp.ndarray  # (M_in,) int32
    out_idx: jnp.ndarray  # (M_out,) int32
    mode: str = flax.struct.field(pytree_node=False)
    dims_in: tuple = flax.struct.field(pytree_node=False)
    dims_out: tuple = flax.struct.field(pytree_node=False)


def cell_index(coords4, valid, dims, stride) -> jnp.ndarray:
    """Flat (B, X, Y, Z)-grid cell index of each voxel row (see DensePlan)."""
    q = coords4[:, 1:] // stride
    flat = ((coords4[:, 0] * dims[1] + q[:, 0]) * dims[2] + q[:, 1]) \
        * dims[3] + q[:, 2]
    cells = dims[0] * dims[1] * dims[2] * dims[3]
    ok = (
        valid
        & (coords4[:, 0] >= 0) & (coords4[:, 0] < dims[0])
        & jnp.all(q >= 0, axis=1)
        & (q[:, 0] < dims[1]) & (q[:, 1] < dims[2]) & (q[:, 2] < dims[3])
    )
    return jnp.where(ok, flat, cells).astype(jnp.int32)


def _prod4(d):
    return d[0] * d[1] * d[2] * d[3]


def _scatter_dense(rows, idx, dims):
    """(M, C) rows -> (B, X, Y, Z, C) dense grid (invalid -> dummy row)."""
    cells = _prod4(dims)
    c = rows.shape[1]
    d = jnp.zeros((cells + 1, c), rows.dtype).at[idx].set(rows, mode="drop")
    return d[:cells].reshape(dims + (c,))


def _gather_dense(grid5, idx, valid_out):
    """(B, X, Y, Z, C) dense grid -> (M, C) rows at ``idx``."""
    c = grid5.shape[-1]
    flat = grid5.reshape(-1, c)
    flat = jnp.concatenate([flat, jnp.zeros((1, c), flat.dtype)], axis=0)
    out = jnp.take(flat, idx, axis=0)
    return jnp.where(valid_out[:, None], out, 0.0)


# k=3 same-level dense core: "conv3d" (lax.conv_general_dilated) or
# "shiftg" (27 static shifted slices, one GEMM each).  On v5e with REAL
# topology conv3d wins every level (shiftg pays 27 full-grid reads:
# 74.75 vs 18.28 ms at L1, _scratch/micro_dense.py); shiftg is kept as a
# tested fallback for backends with slow 3-D conv lowering.
DENSE_SAME_IMPL = "conv3d"


def _dense_core(mode, dims_in, dims_out, x, w, impl=None):
    """Dense conv math on a (B, X, Y, Z, Cin) grid.  ``w`` is (K, Cin, Cout)
    in the ME x-major offset enumeration (dz fastest) — the same layout the
    kernel maps use, so dense and sparse paths share checkpoints."""
    k, cin, cout = w.shape
    if impl is None:
        impl = DENSE_SAME_IMPL
    if mode == "same":
        assert k == 27, k
        if impl == "conv3d":
            return jax.lax.conv_general_dilated(
                x, w.reshape(3, 3, 3, cin, cout),
                window_strides=(1, 1, 1), padding="SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32,
            )
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        cells = _prod4(dims_in)
        acc = jnp.zeros((cells, cout), jnp.float32)
        ki = 0
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                for dz in (0, 1, 2):
                    xs = xp[:, dx:dx + dims_in[1], dy:dy + dims_in[2],
                            dz:dz + dims_in[3], :]
                    acc = acc + jax.lax.dot_general(
                        xs.reshape(cells, cin), w[ki],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    ki += 1
        return acc.reshape(dims_in + (cout,))
    if mode == "down":
        assert k == 8, k
        B, X2, Y2, Z2 = dims_out
        xp = jnp.pad(x, (
            (0, 0),
            (0, 2 * X2 - dims_in[1]),
            (0, 2 * Y2 - dims_in[2]),
            (0, 2 * Z2 - dims_in[3]),
            (0, 0),
        ))
        # out[p] = sum_d W[d] x[2p + d]: disjoint 2x2x2 blocks -> one GEMM
        blk = xp.reshape(B, X2, 2, Y2, 2, Z2, 2, cin)
        blk = blk.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # (B,X2,Y2,Z2, dx,dy,dz, ci)
        y = jax.lax.dot_general(
            blk.reshape(_prod4(dims_out), 8 * cin),
            w.reshape(8 * cin, cout),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y.reshape(dims_out + (cout,))
    if mode == "up":
        assert k == 8, k
        B, X2, Y2, Z2 = dims_in
        # out[2p + d] = W[d]^T x[p]: one GEMM to all 8 children, interleave
        y8 = jax.lax.dot_general(
            x.reshape(_prod4(dims_in), cin),
            jnp.swapaxes(w, 0, 1).reshape(cin, 8 * cout),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(B, X2, Y2, Z2, 2, 2, 2, cout)
        y = y8.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
            B, 2 * X2, 2 * Y2, 2 * Z2, cout)
        return y[:, : dims_out[1], : dims_out[2], : dims_out[3], :]
    raise ValueError(mode)


def _dense_fwd_math(spec, feats, in_idx, out_idx, weights, valid_out):
    mode, dims_in, dims_out = spec
    x = _scatter_dense(feats.astype(COMPUTE_DTYPE), in_idx, dims_in)
    y = _dense_core(mode, dims_in, dims_out,
                    x, weights.astype(COMPUTE_DTYPE))
    return _gather_dense(y, out_idx, valid_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dense_conv_core(spec, feats, in_idx, out_idx, weights, valid_out):
    """Dense-grid conv whose BACKWARD stays dense (no scatter-adds).

    The gather-back's autodiff transpose would be a scatter-ADD; because the
    out cells are unique, a scatter-SET of dy into the dense grid is
    identical, and the inner conv core differentiates through XLA's native
    conv/GEMM transposes.
    """
    return _dense_fwd_math(spec, feats, in_idx, out_idx, weights, valid_out)


def _dc_fwd(spec, feats, in_idx, out_idx, weights, valid_out):
    y = _dense_fwd_math(spec, feats, in_idx, out_idx, weights, valid_out)
    return y, (feats, in_idx, out_idx, weights, valid_out)


def _dc_bwd(spec, res, dy):
    feats, in_idx, out_idx, weights, valid_out = res
    mode, dims_in, dims_out = spec
    dy = jnp.where(valid_out[:, None], dy, 0.0).astype(COMPUTE_DTYPE)
    dy_dense = _scatter_dense(dy, out_idx, dims_out)
    x = _scatter_dense(feats.astype(COMPUTE_DTYPE), in_idx, dims_in)
    # differentiate through the shift-GEMM formulation: identical linear
    # map, and dot_general's transpose handles bf16 operands with an f32
    # cotangent (lax.conv's transpose rejects the dtype mix).  The backward
    # only runs at <= DENSE_MAX_CELLS grids, so the impl choice is free.
    _, pullback = jax.vjp(
        lambda xx, ww: _dense_core(mode, dims_in, dims_out, xx, ww,
                                   impl="shiftg"),
        x, weights.astype(COMPUTE_DTYPE),
    )
    dx_dense, dw = pullback(dy_dense.astype(jnp.float32))
    dx = _gather_dense(dx_dense, in_idx, jnp.ones_like(in_idx, jnp.bool_))
    return (dx.astype(feats.dtype), None, None,
            dw.astype(weights.dtype), None)


_dense_conv_core.defvjp(_dc_fwd, _dc_bwd)


def dense_conv(
    feats: jnp.ndarray,  # (M_in, Cin)
    plan: DensePlan,
    weights: jnp.ndarray,  # (K, Cin, Cout), ME offset enumeration
    valid_out: jnp.ndarray,  # (M_out,) bool
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Sparse conv via a dense coarse-level grid (see DensePlan)."""
    spec = (plan.mode, tuple(plan.dims_in), tuple(plan.dims_out))
    y = _dense_conv_core(spec, feats, plan.in_idx, plan.out_idx,
                         weights, valid_out)
    if bias is not None:
        y = jnp.where(valid_out[:, None], y + bias, 0.0)
    return y


def max_pool(
    feats: jnp.ndarray, kmap: jnp.ndarray, valid_out: jnp.ndarray
) -> jnp.ndarray:
    """Max pooling over the kernel-map neighborhood (e.g. k=2 s=2)."""
    g = jnp.take(feats, kmap, axis=0, mode="fill", fill_value=-jnp.inf)
    present = (kmap >= 0)[:, :, None]
    g = jnp.where(present, g, -jnp.inf)
    y = jnp.max(g, axis=1)
    y = jnp.where(jnp.any(present, axis=1), y, 0.0)
    return jnp.where(valid_out[:, None], y, 0.0)


def global_pool(
    feats: jnp.ndarray,  # (M, C)
    batch_ids: jnp.ndarray,  # (M,) int32
    valid: jnp.ndarray,  # (M,) bool
    num_segments: int,
    mode: str,
) -> jnp.ndarray:
    """Per-batch-item global pooling over valid voxels -> (num_segments, C).

    Replaces ME.MinkowskiGlobalMax/AvgPooling used by the ScoreNet head
    (/root/reference/network/PBNet.py:67-68,274-276).
    """
    seg = jnp.where(valid, batch_ids, num_segments)
    if mode == "max":
        y = jax.ops.segment_max(
            jnp.where(valid[:, None], feats, -jnp.inf),
            seg,
            num_segments=num_segments + 1,
        )[:num_segments]
        return jnp.where(jnp.isfinite(y), y, 0.0)
    if mode == "avg":
        s = jax.ops.segment_sum(
            jnp.where(valid[:, None], feats, 0.0),
            seg,
            num_segments=num_segments + 1,
        )[:num_segments]
        cnt = jax.ops.segment_sum(
            valid.astype(feats.dtype), seg, num_segments=num_segments + 1
        )[:num_segments]
        return s / jnp.maximum(cnt, 1.0)[:, None]
    raise ValueError(mode)
