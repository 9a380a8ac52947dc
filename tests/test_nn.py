"""Tests for sparse NN modules: dense-conv equivalence, UNet smoke + grads."""

import jax
import jax.numpy as jnp
import numpy as np

from pbnet_tpu.core import topology as tp
from pbnet_tpu.nn import minkunet, modules, sparse_ops


def dense_grid_level(side, cap_extra=5):
    coords = np.array(
        [(0, x, y, z) for x in range(side) for y in range(side) for z in range(side)],
        np.int32,
    )
    n = coords.shape[0]
    cap = n + cap_extra
    cpad = np.zeros((cap, 4), np.int32)
    cpad[:n] = coords
    valid = np.arange(cap) < n
    lv = tp.level_from_coords(jnp.asarray(cpad), jnp.asarray(valid), cap, 1)
    return lv, n


class TestGatherConv:
    def test_matches_dense_conv3d(self, rng):
        side, cin, cout, k = 5, 3, 4, 3
        lv, n = dense_grid_level(side)
        km = tp.conv_map(lv, lv, k)
        feats = np.zeros((lv.cap, cin), np.float32)
        dense = rng.randn(side, side, side, cin).astype(np.float32)
        c = np.asarray(lv.coords)
        for i in range(n):
            feats[i] = dense[c[i, 1], c[i, 2], c[i, 3]]
        w = rng.randn(k**3, cin, cout).astype(np.float32)

        # strict f32 parity against the dense oracle
        old = sparse_ops.COMPUTE_DTYPE
        sparse_ops.COMPUTE_DTYPE = jnp.float32
        try:
            y = np.asarray(
                sparse_ops.gather_conv(jnp.asarray(feats), km, jnp.asarray(w), lv.valid)
            )
        finally:
            sparse_ops.COMPUTE_DTYPE = old
        # dense oracle with zero padding
        offs = tp.kernel_offsets(k)
        expect = np.zeros((side, side, side, cout), np.float32)
        pad = np.pad(dense, ((k, k), (k, k), (k, k), (0, 0)))
        for j, (dx, dy, dz) in enumerate(offs):
            expect += np.einsum(
                "xyzc,co->xyzo",
                pad[k + dx : k + dx + side, k + dy : k + dy + side, k + dz : k + dz + side],
                w[j],
            )
        for i in range(n):
            np.testing.assert_allclose(
                y[i], expect[c[i, 1], c[i, 2], c[i, 3]], rtol=2e-4, atol=2e-4
            )
        # pad rows zero
        assert np.all(y[n:] == 0)

    def test_strided_conv_then_transpose_shapes(self, rng):
        lv, n = dense_grid_level(4)
        lv2 = tp.downsample(lv, 2, lv.cap)
        km_d = tp.conv_map(lv2, lv, 2)
        km_u = tp.conv_transpose_map(lv, lv2, 2)
        feats = jnp.asarray(rng.randn(lv.cap, 6).astype(np.float32))
        feats = feats * lv.valid[:, None]
        w = jnp.asarray(rng.randn(8, 6, 7).astype(np.float32))
        y2 = sparse_ops.gather_conv(feats, km_d, w, lv2.valid)
        assert int(jnp.sum(jnp.any(y2 != 0, axis=1))) == int(lv2.count)
        wu = jnp.asarray(rng.randn(8, 7, 6).astype(np.float32))
        y1 = sparse_ops.gather_conv(y2, km_u, wu, lv.valid)
        assert y1.shape == (lv.cap, 6)
        assert bool(jnp.all(y1[~np.asarray(lv.valid)] == 0))

    def test_global_pool(self, rng):
        feats = jnp.asarray(rng.randn(10, 4).astype(np.float32))
        batch = jnp.asarray(np.array([0, 0, 0, 1, 1, 2, 2, 2, 0, 0], np.int32))
        valid = jnp.asarray(np.array([1, 1, 1, 1, 1, 1, 1, 1, 0, 0], bool))
        mx = np.asarray(sparse_ops.global_pool(feats, batch, valid, 4, "max"))
        av = np.asarray(sparse_ops.global_pool(feats, batch, valid, 4, "avg"))
        f = np.asarray(feats)
        np.testing.assert_allclose(mx[0], f[:3].max(0), rtol=1e-6)
        np.testing.assert_allclose(av[1], f[3:5].mean(0), rtol=1e-6)
        assert np.all(mx[3] == 0) and np.all(av[3] == 0)


def sparse_random_level(rng, side=6, keep=0.55, cap_extra=9):
    """Random sparse occupancy on a side^3 grid (holes exercise the absent
    center / broken z-run cases of the conv fast paths)."""
    coords = np.array(
        [(0, x, y, z) for x in range(side) for y in range(side)
         for z in range(side) if rng.rand() < keep],
        np.int32,
    ).reshape(-1, 4)
    n = coords.shape[0]
    cap = n + cap_extra
    cpad = np.zeros((cap, 4), np.int32)
    cpad[:n] = coords
    valid = np.arange(cap) < n
    return tp.level_from_coords(jnp.asarray(cpad), jnp.asarray(valid), cap, 1), n


class TestConvFastPaths:
    """The round-5 gather-elision paths must be bit-equal (up to summation
    order) with the plain gather formulation: center-group z-shifts (zmasks)
    and the single-present up-conv table gather."""

    def _f32(self):
        class Ctx:
            def __enter__(ctx):
                ctx.old = sparse_ops.COMPUTE_DTYPE
                sparse_ops.COMPUTE_DTYPE = jnp.float32

            def __exit__(ctx, *a):
                sparse_ops.COMPUTE_DTYPE = ctx.old
        return Ctx()

    def test_center_group_zmasks_matches_plain(self, rng):
        lv, n = sparse_random_level(rng)
        km = tp.conv_map(lv, lv, 3)
        zm = sparse_ops.zrun_masks(lv.coords, lv.valid, lv.stride)
        for cin in (8, 96):  # windowed and plain-column regimes
            feats = jnp.asarray(rng.randn(lv.cap, cin).astype(np.float32))
            w = jnp.asarray(rng.randn(27, cin, 4).astype(np.float32))
            with self._f32():
                y0 = sparse_ops.gather_conv(feats, km, w, lv.valid)
                y1 = sparse_ops.gather_conv(feats, km, w, lv.valid, zmasks=zm)
                y2 = sparse_ops.gather_conv(
                    feats, km, w, lv.valid, kmap_bwd=km[:, ::-1], zmasks=zm
                )
            # f32 summation-order tolerance: the center group accumulates in
            # its own GEMM instead of inside the big img2col GEMM
            np.testing.assert_allclose(y1, y0, rtol=1e-4, atol=3e-5)
            np.testing.assert_allclose(y2, y0, rtol=1e-4, atol=3e-5)

    def test_center_group_grads_match(self, rng):
        lv, n = sparse_random_level(rng)
        km = tp.conv_map(lv, lv, 3)
        zm = sparse_ops.zrun_masks(lv.coords, lv.valid, lv.stride)
        feats = jnp.asarray(rng.randn(lv.cap, 8).astype(np.float32))
        w = jnp.asarray(rng.randn(27, 8, 4).astype(np.float32))

        def loss(f, w, zmasks):
            y = sparse_ops.gather_conv(
                f, km, w, lv.valid, kmap_bwd=km[:, ::-1], zmasks=zmasks
            )
            return jnp.sum(y * y)

        with self._f32():
            g0 = jax.grad(loss, argnums=(0, 1))(feats, w, None)
            g1 = jax.grad(loss, argnums=(0, 1))(feats, w, zm)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)

    def test_single_present_up_conv_matches(self, rng):
        lv, n = sparse_random_level(rng)
        lv2 = tp.downsample(lv, 2, 128)
        down = tp.conv_map(lv2, lv, 2)
        up = tp.invert_map(down, lv.cap)
        # sanity: up maps ARE single-present (k2s2 geometry)
        assert int(jnp.max(jnp.sum(up >= 0, axis=1))) <= 1
        feats = jnp.asarray(rng.randn(128, 16).astype(np.float32))
        feats = jnp.where(lv2.valid[:, None], feats, 0.0)
        w = jnp.asarray(rng.randn(8, 16, 6).astype(np.float32))

        def loss(f, w, sp):
            y = sparse_ops.gather_conv(
                f, up, w, lv.valid, kmap_bwd=down, single_present=sp
            )
            return jnp.sum(y * y), y

        with self._f32():
            g0, y0 = jax.grad(loss, argnums=(0, 1), has_aux=True)(feats, w, False)
            g1, y1 = jax.grad(loss, argnums=(0, 1), has_aux=True)(feats, w, True)
        np.testing.assert_allclose(y1, y0, rtol=1e-5, atol=1e-5)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


class TestBatchNorm:
    def test_masked_stats_ignore_pads(self, rng):
        x = rng.randn(20, 3).astype(np.float32)
        valid = np.arange(20) < 12
        x[~valid] = 0
        bn = modules.MaskedBatchNorm()
        vars_ = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(valid), True)
        y, updates = bn.apply(
            vars_, jnp.asarray(x), jnp.asarray(valid), True,
            mutable=["batch_stats"],
        )
        y = np.asarray(y)
        np.testing.assert_allclose(y[:12].mean(0), 0, atol=1e-5)
        np.testing.assert_allclose(y[:12].std(0), 1, atol=1e-2)
        assert np.all(y[12:] == 0)
        # running stats moved toward batch stats with momentum 0.1
        rm = np.asarray(updates["batch_stats"]["mean"])
        np.testing.assert_allclose(rm, 0.1 * x[:12].mean(0), rtol=1e-4, atol=1e-6)

    def test_eval_uses_running_stats(self, rng):
        x = rng.randn(8, 2).astype(np.float32)
        valid = np.ones(8, bool)
        bn = modules.MaskedBatchNorm()
        vars_ = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(valid), True)
        y = bn.apply(vars_, jnp.asarray(x), jnp.asarray(valid), False)
        # fresh stats: mean 0 var 1 -> identity (gamma=1, beta=0)
        np.testing.assert_allclose(np.asarray(y), x, rtol=1e-4, atol=1e-5)


class TestMinkUNet:
    def _topo(self, rng, n=200, extent=24):
        c = np.unique(
            np.stack(
                [
                    rng.randint(0, 2, n),
                    rng.randint(0, extent, n),
                    rng.randint(0, extent, n),
                    rng.randint(0, extent, n),
                ],
                1,
            ).astype(np.int32),
            axis=0,
        )
        caps = [c.shape[0] + 8] * 5
        cpad = np.zeros((caps[0], 4), np.int32)
        cpad[: c.shape[0]] = c
        valid = np.arange(caps[0]) < c.shape[0]
        lv = tp.level_from_coords(jnp.asarray(cpad), jnp.asarray(valid), caps[0], 1)
        return tp.build_unet_topology(lv, caps)

    def test_forward_and_grad(self, rng):
        topo = self._topo(rng)
        model = minkunet.mink_unet(13, "MinkUNet14A")
        feats = jnp.asarray(rng.randn(topo.levels[0].cap, 6).astype(np.float32))
        feats = feats * topo.levels[0].valid[:, None]
        variables = jax.jit(
            lambda t, f: model.init(jax.random.PRNGKey(0), t, f, True)
        )(topo, feats)
        apply_fn = jax.jit(
            lambda v, t, f: model.apply(v, t, f, True, mutable=["batch_stats"])
        )
        out, _ = apply_fn(variables, topo, feats)
        assert out.shape == (topo.levels[0].cap, 13)
        assert bool(jnp.all(out[~np.asarray(topo.levels[0].valid)] == 0))
        assert np.isfinite(np.asarray(out)).all()

        def loss_fn(params):
            y, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                topo, feats, True, mutable=["batch_stats"],
            )
            return jnp.sum(y**2)

        g = jax.jit(jax.grad(loss_fn))(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

    def test_mini_unet_forward(self, rng):
        topo = self._topo(rng, n=80, extent=10)
        model = minkunet.mink_unet(1, "Mini_Unet")
        feats = jnp.asarray(rng.randn(topo.levels[0].cap, 34).astype(np.float32))
        feats = feats * topo.levels[0].valid[:, None]
        variables = jax.jit(
            lambda t, f: model.init(jax.random.PRNGKey(1), t, f, True)
        )(topo, feats)
        out, _ = jax.jit(
            lambda v, t, f: model.apply(v, t, f, True, mutable=["batch_stats"])
        )(variables, topo, feats)
        assert out.shape == (topo.levels[0].cap, 1)
        assert np.isfinite(np.asarray(out)).all()


class TestConvVJP:
    """The custom gather-backward must match autodiff on all VALID rows.

    (Autodiff of take(mode='fill') scatters dropped-entry cotangents into the
    wrapped index -1 = last pad row; the custom VJP correctly yields 0 there.)
    """

    def _level_pair(self, rng):
        c = np.unique(
            np.stack([np.zeros(300, int), rng.randint(0, 12, 300),
                      rng.randint(0, 12, 300), rng.randint(0, 12, 300)], 1
                     ).astype(np.int32), axis=0)
        n = c.shape[0]
        cap = n + 7
        cpad = np.zeros((cap, 4), np.int32)
        cpad[:n] = c
        valid = np.arange(cap) < n
        lv = tp.level_from_coords(jnp.asarray(cpad), jnp.asarray(valid), cap, 1)
        lv2 = tp.downsample(lv, 2, cap)
        return lv, lv2

    def test_transpose_identity(self, rng):
        lv, _ = self._level_pair(rng)
        km = np.asarray(tp.conv_map(lv, lv, 3))
        K = km.shape[1]
        for i in range(km.shape[0]):
            for k in range(K):
                j = km[i, k]
                if j >= 0:
                    assert km[j, K - 1 - k] == i

    def test_grads_match_autodiff(self, rng):
        lv, lv2 = self._level_pair(rng)
        cases = [
            (tp.conv_map(lv, lv, 3), None, lv.valid, "flip"),
            (tp.conv_map(lv2, lv, 2), tp.conv_transpose_map(lv, lv2, 2),
             lv2.valid, "pair"),
        ]
        for kf, kb, vout, mode in cases:
            if mode == "flip":
                kb = kf[:, ::-1]
            K = kf.shape[1]
            x = jnp.asarray(rng.randn(lv.cap, 5).astype(np.float32))
            x = x * lv.valid[:, None]
            w = jnp.asarray(rng.randn(K, 5, 4).astype(np.float32))
            dy = jnp.asarray(rng.randn(lv.cap, 4).astype(np.float32))

            f_ref = lambda x, w: jnp.sum(
                sparse_ops.gather_conv(x, kf, w, vout) * dy)
            f_new = lambda x, w: jnp.sum(
                sparse_ops.gather_conv(x, kf, w, vout, kmap_bwd=kb) * dy)
            gx_r, gw_r = jax.grad(f_ref, argnums=(0, 1))(x, w)
            gx_n, gw_n = jax.grad(f_new, argnums=(0, 1))(x, w)
            vmask = np.asarray(lv.valid)
            # conv compute is bf16 with f32 accumulation; the two backward
            # formulations accumulate in different orders -> bf16-level noise
            def close(a, b):
                a, b = np.asarray(a), np.asarray(b)
                tol = 2e-2 * max(np.abs(b).max(), 1.0)
                np.testing.assert_allclose(a, b, atol=tol)
            close(np.asarray(gx_r)[vmask], np.asarray(gx_n)[vmask])
            close(gw_r, gw_n)


class TestWindowImg2col:
    """The z-window img2col must match scalar img2col for every sub-window
    plan (kz*C <= 128 one-gather windows, split windows for wider rows)."""

    def _sparse_level(self, rng, side=9, keep=0.55):
        coords = np.array(
            [(0, x, y, z) for x in range(side) for y in range(side)
             for z in range(side)], np.int32,
        )
        coords = coords[rng.rand(len(coords)) < keep]
        n = coords.shape[0]
        cap = n + 7
        cpad = np.zeros((cap, 4), np.int32)
        cpad[:n] = coords
        valid = np.arange(cap) < n
        return tp.level_from_coords(
            jnp.asarray(cpad), jnp.asarray(valid), cap, 1), n

    def test_window_matches_scalar(self, rng, fast_compile):
        lv, n = self._sparse_level(rng)
        for k, kz in [(3, 3), (5, 5), (2, 2)]:
            if k == 2:
                down = tp.downsample(lv, 2, lv.cap)
                km = tp.conv_map(down, lv, 2)
            else:
                km = tp.conv_map(lv, lv, k)
            for cin in (6, 16, 32, 34, 48, 96):
                feats = jnp.asarray(
                    rng.randn(lv.cap, cin).astype(np.float32)
                ) * jnp.asarray(lv.valid)[:, None]
                w = sparse_ops._window_plan(kz, cin)
                scalar = jnp.take(
                    feats.astype(sparse_ops.COMPUTE_DTYPE), km, axis=0,
                    mode="fill", fill_value=0,
                ).reshape(km.shape[0], k**3 * cin)
                if w is None:
                    continue
                windowed = sparse_ops._window_img2col(feats, km, kz, w)
                np.testing.assert_allclose(
                    np.asarray(windowed, np.float32),
                    np.asarray(scalar, np.float32),
                    err_msg=f"k={k} cin={cin} w={w}",
                )
                # column-reversed (backward) maps must also reconstruct
                windowed_r = sparse_ops._window_img2col(
                    feats, km[:, ::-1], kz, w
                )
                scalar_r = jnp.take(
                    feats.astype(sparse_ops.COMPUTE_DTYPE), km[:, ::-1],
                    axis=0, mode="fill", fill_value=0,
                ).reshape(km.shape[0], k**3 * cin)
                np.testing.assert_allclose(
                    np.asarray(windowed_r, np.float32),
                    np.asarray(scalar_r, np.float32),
                    err_msg=f"reversed k={k} cin={cin} w={w}",
                )

    def test_plan_lane_budget(self):
        assert sparse_ops._window_plan(3, 6) == 3
        assert sparse_ops._window_plan(3, 32) == 3   # 96 lanes, one tile
        assert sparse_ops._window_plan(3, 48) == 3   # 144 lanes, full z-run
        assert sparse_ops._window_plan(3, 64) == 3   # 192 lanes, full z-run
        assert sparse_ops._window_plan(3, 96) is None  # 288 lanes: direct wins
        assert sparse_ops._window_plan(5, 32) == 5   # 160 lanes, full z-run
        assert sparse_ops._window_plan(5, 34) == 5   # 170 lanes, full z-run
        assert sparse_ops._window_plan(5, 64) == 2   # 320 > 192: partial
        assert sparse_ops._window_plan(2, 64) == 2
        assert sparse_ops._window_plan(2, 96) == 2   # 192 lanes, full z-run
        assert sparse_ops._window_plan(2, 128) is None
        assert sparse_ops._window_plan(None, 32) is None


class TestMissingNeighborZero:
    """A -1 kernel-map entry must contribute exactly zero even when the
    input level runs at FULL capacity (last row valid and nonzero).

    Regression: jnp.take(mode="fill") wraps -1 to the last row instead of
    filling, so full levels silently added feats[cap-1] per missing
    neighbor (and dy[cap-1] in the gradient)."""

    def test_fwd_and_bwd_ignore_missing(self, rng):
        # 1-D line of voxels at z = {0, 1, 3, 6} with k=3 offsets (-1,0,+1):
        # a geometrically valid same-level map with many missing neighbors.
        n, k, cin, cout = 4, 3, 5, 2
        feats = jnp.asarray(rng.randn(n, cin).astype(np.float32)) + 1.0
        w = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32) * 0.1)
        valid = jnp.ones((n,), bool)  # FULL capacity: row n-1 valid+nonzero
        kmap = jnp.asarray(np.array(
            [[-1, 0, 1], [0, 1, -1], [-1, 2, -1], [-1, 3, -1]], np.int32))
        kmap_bwd = kmap[:, ::-1]  # symmetric same-level offsets

        def run(with_bwd_map):
            return sparse_ops.gather_conv(
                feats, kmap, w, valid,
                kmap_bwd=kmap_bwd if with_bwd_map else None)

        y = run(True)
        # manual reference: sum over present slots only
        ref = np.zeros((n, cout), np.float32)
        kn, fn, wn = np.asarray(kmap), np.asarray(feats), np.asarray(w)
        for i in range(n):
            for s in range(k):
                if kn[i, s] >= 0:
                    ref[i] += fn[kn[i, s]] @ wn[s]
        np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(run(False)), ref,
                                   rtol=2e-2, atol=2e-2)

        # isolated voxel (row 2): exactly the center tap, nothing from row 3
        np.testing.assert_allclose(
            np.asarray(y)[2], fn[2] @ wn[1], rtol=2e-2, atol=2e-2)

        # gradient wrt feats: gather-form backward must also drop -1 slots
        g_gather = jax.grad(lambda f: jnp.sum(sparse_ops.gather_conv(
            f, kmap, w, valid, kmap_bwd=kmap_bwd) ** 2))(feats)
        g_auto = jax.grad(lambda f: jnp.sum(sparse_ops.gather_conv(
            f, kmap, w, valid) ** 2))(feats)
        np.testing.assert_allclose(np.asarray(g_gather), np.asarray(g_auto),
                                   rtol=5e-2, atol=5e-2)


class TestDenseConv:
    """The coarse-level dense-grid conv must match gather-GEMM exactly
    (same weights/enumeration) in f32, forward and backward, for all three
    modes — and for both same-level core implementations."""

    def _levels(self, rng, side=11, keep=0.5):
        coords = np.array(
            [(0, x, y, z) for x in range(side) for y in range(side)
             for z in range(max(side - 3, 2))], np.int32,
        )
        coords = coords[rng.rand(len(coords)) < keep]
        n = coords.shape[0]
        cap = n + 9
        cpad = np.zeros((cap, 4), np.int32)
        cpad[:n] = coords
        valid = np.arange(cap) < n
        lv = tp.level_from_coords(jnp.asarray(cpad), jnp.asarray(valid), cap, 1)
        lv2 = tp.downsample(lv, 2, cap)
        extent = (1, side, side, side)
        dims1 = extent
        dims2 = (1, -(-side // 2), -(-side // 2), -(-side // 2))
        return lv, lv2, dims1, dims2

    def _plan(self, lv_in, lv_out, dims_in, dims_out, mode):
        i_in = sparse_ops.cell_index(lv_in.coords, lv_in.valid, dims_in,
                                     lv_in.stride)
        i_out = sparse_ops.cell_index(lv_out.coords, lv_out.valid, dims_out,
                                      lv_out.stride)
        return sparse_ops.DensePlan(in_idx=i_in, out_idx=i_out, mode=mode,
                                    dims_in=dims_in, dims_out=dims_out)

    def test_all_modes_match_gather_conv(self, rng):
        lv, lv2, dims1, dims2 = self._levels(rng)
        km3 = tp.conv_map(lv, lv, 3)
        kmd = tp.conv_map(lv2, lv, 2)
        kmu = tp.conv_transpose_map(lv, lv2, 2)
        cases = [
            ("same", km3, lv, lv, dims1, dims1, 27),
            ("down", kmd, lv, lv2, dims1, dims2, 8),
            ("up", kmu, lv2, lv, dims2, dims1, 8),
        ]
        old_dtype = sparse_ops.COMPUTE_DTYPE
        old_impl = sparse_ops.DENSE_SAME_IMPL
        sparse_ops.COMPUTE_DTYPE = jnp.float32
        try:
            for mode, km, li, lo, di, do, K in cases:
                x = jnp.asarray(rng.randn(li.cap, 5).astype(np.float32))
                x = x * li.valid[:, None]
                w = jnp.asarray(rng.randn(K, 5, 4).astype(np.float32))
                dy = jnp.asarray(rng.randn(lo.cap, 4).astype(np.float32))
                plan = self._plan(li, lo, di, do, mode)

                f_sp = lambda x, w: jnp.sum(
                    sparse_ops.gather_conv(x, km, w, lo.valid) * dy)
                impls = ("shiftg", "conv3d") if mode == "same" else (old_impl,)
                for impl in impls:
                    sparse_ops.DENSE_SAME_IMPL = impl
                    f_dn = lambda x, w: jnp.sum(
                        sparse_ops.dense_conv(x, plan, w, lo.valid) * dy)
                    np.testing.assert_allclose(
                        np.asarray(sparse_ops.dense_conv(x, plan, w, lo.valid)),
                        np.asarray(sparse_ops.gather_conv(x, km, w, lo.valid)),
                        rtol=1e-4, atol=1e-4,
                        err_msg=f"{mode}/{impl} forward",
                    )
                    gx_s, gw_s = jax.grad(f_sp, argnums=(0, 1))(x, w)
                    gx_d, gw_d = jax.grad(f_dn, argnums=(0, 1))(x, w)
                    vm = np.asarray(li.valid)
                    np.testing.assert_allclose(
                        np.asarray(gx_d)[vm], np.asarray(gx_s)[vm],
                        rtol=1e-4, atol=1e-4, err_msg=f"{mode}/{impl} gx")
                    np.testing.assert_allclose(
                        np.asarray(gw_d), np.asarray(gw_s),
                        rtol=1e-4, atol=1e-4, err_msg=f"{mode}/{impl} gw")
        finally:
            sparse_ops.COMPUTE_DTYPE = old_dtype
            sparse_ops.DENSE_SAME_IMPL = old_impl

    def test_bf16_backward_runs(self, rng):
        """Production dtype (bf16 compute) must differentiate through all
        three dense modes — lax.conv's transpose rejects the bf16/f32 mix,
        so the backward routes through the shift-GEMM formulation."""
        lv, lv2, dims1, dims2 = self._levels(rng)
        cases = [("same", lv, lv, dims1, dims1, 27),
                 ("down", lv, lv2, dims1, dims2, 8),
                 ("up", lv2, lv, dims2, dims1, 8)]
        assert sparse_ops.COMPUTE_DTYPE == jnp.bfloat16
        for mode, li, lo, di, do, K in cases:
            x = jnp.asarray(rng.randn(li.cap, 5).astype(np.float32))
            w = jnp.asarray(rng.randn(K, 5, 4).astype(np.float32))
            plan = self._plan(li, lo, di, do, mode)
            f = lambda x, w: jnp.sum(
                sparse_ops.dense_conv(x, plan, w, lo.valid) ** 2)
            gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
            assert np.isfinite(np.asarray(gx)).all(), mode
            assert np.isfinite(np.asarray(gw)).all(), mode

    def test_unet_forward_matches_with_dense_levels(self, rng, fast_compile):
        """A full MinkUNet forward with the dense gate covering levels 1+
        must equal the all-sparse forward (f32)."""
        side = 10
        coords = np.array(
            [(0, x, y, z) for x in range(side) for y in range(side)
             for z in range(side)], np.int32,
        )
        coords = coords[rng.rand(len(coords)) < 0.4]
        n = coords.shape[0]
        cap = n + 8
        cpad = np.zeros((cap, 4), np.int32)
        cpad[:n] = coords
        valid = np.arange(cap) < n
        lv0 = tp.level_from_coords(jnp.asarray(cpad), jnp.asarray(valid), cap, 1)
        caps = [cap] * 5
        extent = (1, side, side, side)
        topo = tp.build_unet_topology(lv0, caps, extent=extent)
        feats = jnp.asarray(rng.randn(cap, 3).astype(np.float32))
        feats = feats * lv0.valid[:, None]
        model = minkunet.mink_unet(7, arch="MinkUNet14A")

        old_dtype = sparse_ops.COMPUTE_DTYPE
        old_gate = minkunet.DENSE_MAX_CELLS
        sparse_ops.COMPUTE_DTYPE = jnp.float32
        try:
            var = model.init(jax.random.PRNGKey(0), topo, feats, False)
            minkunet.DENSE_MAX_CELLS = 0  # all sparse
            y_sparse = model.apply(var, topo, feats, False)
            minkunet.DENSE_MAX_CELLS = side ** 3 + 1  # dense at L1+ (not L0)
            y_dense = model.apply(var, topo, feats, False)
        finally:
            sparse_ops.COMPUTE_DTYPE = old_dtype
            minkunet.DENSE_MAX_CELLS = old_gate
        np.testing.assert_allclose(
            np.asarray(y_dense), np.asarray(y_sparse), rtol=2e-4, atol=2e-4)
