"""Banded one-hot MXU conv (nn/onehot_conv.py): plan construction, kernel
bit-parity vs the gather-GEMM fallback (Pallas interpreter on CPU), and the
end-to-end MinkUNet routing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbnet_tpu.nn import onehot_conv as oc
from pbnet_tpu.nn import sparse_ops


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(oc, "INTERPRET", True)


def synth_map(rng, M, m_in, K, kz, jitter=40, present=0.7):
    """Monotone-ish kernel map mimicking key-sorted topology locality."""
    kmap = np.full((M, K), -1, np.int32)
    for g in range(K // kz):
        base = np.clip(np.arange(M) + rng.randint(-jitter, jitter), 0,
                       m_in - kz)
        for k in range(kz):
            mask = rng.rand(M) < present
            kmap[mask, g * kz + k] = base[mask] + k
    return jnp.asarray(kmap)


class TestPlan:
    def test_no_plan_when_untileable(self):
        rng = np.random.RandomState(0)
        km = synth_map(rng, 100, 128, 27, 3)  # 100 % 64 != 0
        assert oc.build_onehot_plan(km, 3, 128, tm=64, span=128) is None
        km2 = synth_map(rng, 128, 100, 27, 3)  # m_in < span
        assert oc.build_onehot_plan(km2, 3, 100, tm=64, span=128) is None

    def test_overflow_counts_dropped_entries(self):
        rng = np.random.RandomState(1)
        km = synth_map(rng, 256, 256, 27, 3, jitter=100)
        wide = oc.build_onehot_plan(km, 3, 256, tm=128, span=256)
        assert int(wide.overflow) == 0
        tight = oc.build_onehot_plan(km, 3, 256, tm=128, span=64)
        # spans larger than 64 must drop entries, and the drop is counted
        assert int(tight.overflow) > 0

    def test_rel_points_at_map_entries(self):
        rng = np.random.RandomState(2)
        km = synth_map(rng, 128, 256, 8, 2)
        p = oc.build_onehot_plan(km, 2, 256, tm=64, span=128)
        km4 = np.asarray(km).reshape(2, 64, 4, 2)
        rel4 = np.asarray(p.rel).reshape(2, 64, 4, 2)
        starts = np.asarray(p.starts)
        recon = rel4 + starts[:, None, :, None]
        present = km4 >= 0
        in_band = rel4 < p.span
        np.testing.assert_array_equal(recon[present & in_band],
                                      km4[present & in_band])


class TestKernel:
    @pytest.mark.parametrize("K,kz,cin,cout", [(27, 3, 32, 16), (8, 2, 64, 32)])
    def test_matches_gather_conv(self, K, kz, cin, cout):
        rng = np.random.RandomState(3)
        M, m_in = 256, 256
        km = synth_map(rng, M, m_in, K, kz)
        plan = oc.build_onehot_plan(km, kz, m_in, tm=128, span=192)
        assert int(plan.overflow) == 0
        feats = jnp.asarray(rng.randn(m_in, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(K, cin, cout).astype(np.float32) * 0.1)
        valid = jnp.asarray(np.arange(M) < M - 7)
        ref = sparse_ops._conv_fwd_math(feats, km, w, valid, kz=kz)
        got = oc.onehot_conv(feats, plan, w, valid)
        scale = float(jnp.max(jnp.abs(ref))) + 1e-6
        assert float(jnp.max(jnp.abs(ref - got))) <= 1e-4 * scale

    def test_reverse_plan_matches_reversed_map(self):
        rng = np.random.RandomState(4)
        M, m_in, K, kz, cin, cout = 256, 256, 27, 3, 32, 16
        km = synth_map(rng, M, m_in, K, kz)
        plan = oc.reverse_plan(oc.build_onehot_plan(km, kz, m_in, tm=128,
                                                    span=192))
        feats = jnp.asarray(rng.randn(m_in, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(K, cin, cout).astype(np.float32) * 0.1)
        valid = jnp.asarray(np.ones(M, bool))
        ref = sparse_ops._conv_fwd_math(feats, km[:, ::-1], w, valid, kz=kz)
        got = oc.onehot_conv(feats, plan, w, valid)
        scale = float(jnp.max(jnp.abs(ref))) + 1e-6
        assert float(jnp.max(jnp.abs(ref - got))) <= 1e-4 * scale

    def test_gather_conv_routes_plan(self):
        """gather_conv(plan=...) must produce the same values as without."""
        rng = np.random.RandomState(5)
        M, m_in, K, kz, cin, cout = 256, 256, 27, 3, 32, 16
        km = synth_map(rng, M, m_in, K, kz)
        plan = oc.build_onehot_plan(km, kz, m_in, tm=128, span=192)
        feats = jnp.asarray(rng.randn(m_in, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(K, cin, cout).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(cout).astype(np.float32))
        valid = jnp.asarray(np.arange(M) < M - 3)
        ref = sparse_ops.gather_conv(feats, km, w, valid, b)
        got = sparse_ops.gather_conv(feats, km, w, valid, b, plan=plan)
        scale = float(jnp.max(jnp.abs(ref))) + 1e-6
        assert float(jnp.max(jnp.abs(ref - got))) <= 1e-4 * scale

    def test_small_cin_keeps_gather_path(self):
        """cin < MIN_CIN must not route to the MXU-hostile one-hot path."""
        rng = np.random.RandomState(6)
        M, m_in, K, kz = 256, 256, 27, 3
        km = synth_map(rng, M, m_in, K, kz)
        plan = oc.build_onehot_plan(km, kz, m_in, tm=128, span=192)
        feats = jnp.asarray(rng.randn(m_in, 6).astype(np.float32))
        w = jnp.asarray(rng.randn(K, 6, 16).astype(np.float32) * 0.1)
        valid = jnp.asarray(np.ones(M, bool))
        ref = sparse_ops.gather_conv(feats, km, w, valid)
        got = sparse_ops.gather_conv(feats, km, w, valid, plan=plan)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


class TestTopologyAttach:
    @pytest.mark.slow  # frozen-experimental feature (ARCHITECTURE.md): full
    # interpret-mode UNet parity is the suite's 4th-costliest compile
    def test_attach_and_unet_parity(self):
        """A MinkUNet forward with plans attached equals the plain forward
        (main-topology path, tiny real pyramid)."""
        from pbnet_tpu.core import topology as tp
        from pbnet_tpu.models.pbnet import make_level0
        from pbnet_tpu.nn import minkunet

        rng = np.random.RandomState(7)
        n = 700
        xyz = (rng.rand(n, 3) * np.array([60, 60, 24])).astype(np.int32)
        xyz = np.unique(xyz, axis=0)
        m = xyz.shape[0]
        cap = 1024
        coords = np.zeros((cap, 4), np.int32)
        coords[:m, 1:] = xyz
        feats = np.zeros((cap, 32), np.float32)
        feats[:m] = rng.randn(m, 32) * 0.1
        valid = np.arange(cap) < m

        caps = [1024, 512]
        level0, f0 = make_level0(
            jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid)
        )
        topo = tp.build_unet_topology(level0, caps, extent=(1, 64, 64, 32))
        topo_p = oc.attach_plans(topo, tm=128, spans=(256, 256))
        assert topo_p.k3_plans[0] is not None
        assert int(topo_p.plan_overflow) == 0

        model = minkunet.mink_unet(16, "Mini_Unet")
        vs = model.init(jax.random.PRNGKey(0), topo, f0, False)
        ref = model.apply(vs, topo, f0, False)
        got = model.apply(vs, topo_p, f0, False)
        scale = float(jnp.max(jnp.abs(ref))) + 1e-6
        assert float(jnp.max(jnp.abs(ref - got))) <= 1e-4 * scale
        # training must ignore plans (no VJP on the kernel): grads flow
        def loss(p):
            y = model.apply(p, topo_p, f0, True,
                            mutable=["batch_stats"])[0]
            return jnp.sum(y * y)

        g = jax.grad(loss)(vs)
        gn = float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), g["params"], 0.0))
        assert np.isfinite(gn) and gn > 0
