"""Checkpoint converter tests: synthesize a reference-style torch state dict
from initialized pbnet_tpu variables, convert, and assert full coverage."""

import os

import numpy as np
import jax
import pytest

from pbnet_tpu.tools import convert_checkpoint as cc


def shapes5():
    """Full-depth (5-level) tiny shapes: the default (34C/14A/34C) archs need
    5 pyramid levels, and converter coverage / the round-2 goldens depend on
    the full three-UNet tree.  test_pbnet's TINY is 2-level for compile cost,
    so this module carries its own variant (same caps as the round-2 TINY the
    goldens were generated against)."""
    import dataclasses

    from tests.test_pbnet import TINY

    return dataclasses.replace(
        TINY,
        voxel_caps=(1024, 512, 256, 128, 64),
        local_voxel_caps=(1024, 512, 256, 128, 64),
        score_voxel_caps=(1024, 512, 256, 128, 64),
    )


class TestOffsetPermutation:
    def test_identity_for_z_fastest(self):
        for k in (2, 3, 5):
            np.testing.assert_array_equal(
                cc.me_offset_permutation(k, "z_fastest"), np.arange(k**3)
            )

    def test_x_fastest_is_inverse_order(self):
        p3 = cc.me_offset_permutation(3, "x_fastest")
        assert sorted(p3.tolist()) == list(range(27))
        # (dx,dy,dz)=(-1,-1,-1) is index 0 in both orders
        assert p3[0] == 0
        # ours[1] = (-1,-1,0) -> me index: dz=0 plane -> 9
        assert p3[1] == 9


def synth_state_dict(variables):
    """Build a reference-style state dict carrying our param values."""
    sd = {}
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    inv_conv = {v: k for k, v in cc._CONV_RENAME.items()}

    def bn_entries(prefix, p, s):
        sd[prefix + ".bn.weight"] = p["scale"]
        sd[prefix + ".bn.bias"] = p["bias"]
        sd[prefix + ".bn.running_mean"] = s["mean"]
        sd[prefix + ".bn.running_var"] = s["var"]

    for top in cc.UNETS:
        for name, sub in params[top].items():
            sp = stats[top].get(name, {})
            if name in inv_conv:
                ref = f"{top}.{inv_conv[name]}"
                if "kernel" in sub and not isinstance(sub["kernel"], dict):
                    sd[ref + ".kernel"] = sub["kernel"]
                elif "Dense_0" in sub:
                    sd[ref + ".kernel"] = sub["Dense_0"]["kernel"]
                    if "bias" in sub["Dense_0"]:
                        sd[ref + ".bias"] = sub["Dense_0"]["bias"]
            elif name in cc._BN_RENAME.values():
                bn_entries(f"{top}.{name}", sub, sp)
            elif name.startswith("block"):
                base, idx = name.rsplit("_", 1)
                ref = f"{top}.{base}.{idx}"
                sd[ref + ".conv1.kernel"] = sub["conv1"]["kernel"]
                sd[ref + ".conv2.kernel"] = sub["conv2"]["kernel"]
                bn_entries(ref + ".norm1", sub["norm1"], sp["norm1"])
                bn_entries(ref + ".norm2", sub["norm2"], sp["norm2"])
                if "downsample_conv" in sub:
                    sd[ref + ".downsample.0.kernel"] = sub["downsample_conv"]["Dense_0"]["kernel"]
                    bn_entries(ref + ".downsample.1", sub["downsample_norm"],
                               sp["downsample_norm"])
    for head in cc.HEADS:
        p = params[head]
        s = stats[head]
        sd[f"module.{head}.0.linear.weight"] = p["linear1"]["Dense_0"]["kernel"].T
        bn_entries(f"{head}.1", p["norm"], s["norm"])
        sd[f"{head}.2.weight"] = p["prelu"]["alpha"]
        sd[f"{head}.3.linear.weight"] = p["linear2"]["Dense_0"]["kernel"].T
        sd[f"{head}.3.linear.bias"] = p["linear2"]["Dense_0"]["bias"]
    return sd


class TestConversion:
    def test_roundtrip_covers_all_params(self):
        from tests.test_pbnet import synthetic_batch

        from pbnet_tpu.models.pbnet import PBNet

        rng = np.random.RandomState(3)
        batch, _ = synthetic_batch(rng)
        model = PBNet(shapes=shapes5())
        variables = jax.jit(
            lambda key, b: model.init(
                key, b, with_instances=True, with_labels=True, train=False
            )
        )(jax.random.PRNGKey(0), batch)

        sd = synth_state_dict(variables)
        # z_fastest = identity permutation: values must round-trip exactly
        params, stats = cc.convert_state_dict(sd, me_order="z_fastest")
        merged, unmatched = cc.merge_into_variables(variables, params, stats)
        assert unmatched == [], unmatched[:10]

        flat_ref = jax.tree_util.tree_leaves_with_path(
            jax.device_get(variables["params"])
        )
        flat_new = dict(
            jax.tree_util.tree_leaves_with_path(merged["params"])
        )
        n_checked = 0
        for path, val in flat_ref:
            np.testing.assert_allclose(
                np.asarray(flat_new[path]), np.asarray(val), atol=1e-6,
                err_msg=str(path),
            )
            n_checked += 1
        assert n_checked > 300  # the full three-UNet model

    def test_me_order_permutes_kernels(self):
        k = np.arange(27 * 2 * 3, dtype=np.float32).reshape(27, 2, 3)
        out = cc._conv_kernel(k, "x_fastest")
        assert out.shape == k.shape
        assert not np.array_equal(out, k)
        # permutation, not mangling
        np.testing.assert_allclose(np.sort(out.ravel()), np.sort(k.ravel()))


def write_reference_pth(variables, path):
    """Write variables as a reference-FORMAT .pth (torch tensors, ME module
    names, ME x-fastest kernel offset order, {'model':..., 'optimizer':...}
    payload per /root/reference/tools/log.py:104-116)."""
    import torch

    sd = synth_state_dict(variables)
    tsd = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if k.endswith(".kernel") and v.ndim == 3:
            kk = round(v.shape[0] ** (1 / 3))
            inv = np.argsort(cc.me_offset_permutation(kk, "x_fastest"))
            v = v[inv]  # store in ME x-fastest order
        name = k if k.startswith("module.") else "module." + k
        tsd[name] = torch.from_numpy(np.ascontiguousarray(v))
    torch.save({"model": tsd, "optimizer": {}}, path)


class TestReferencePthGolden:
    """Golden parity harness (round-2 VERDICT item 4): fabricate a
    reference-FORMAT .pth (torch tensors, ME module names, ME x-fastest
    kernel offset order, {'model':..., 'optimizer':...} payload per
    /root/reference/tools/log.py:104-116), load it through
    load_reference_checkpoint, and assert (a) exact value recovery and
    (b) stage-1 semantic logits stable across refactors.

    Fails if the conv weight layout, offset enumeration, BN semantics, or
    head wiring drift."""

    def _setup(self):
        from tests.test_pbnet import synthetic_batch

        from pbnet_tpu.models.pbnet import PBNet

        rng = np.random.RandomState(3)
        batch, _ = synthetic_batch(rng)
        model = PBNet(shapes=shapes5())
        variables = jax.jit(
            lambda key, b: model.init(
                key, b, with_instances=True, with_labels=True, train=False
            )
        )(jax.random.PRNGKey(7), batch)
        return model, batch, variables

    def _write_pth(self, variables, path):
        write_reference_pth(variables, path)

    def test_pth_roundtrip_exact(self, tmp_path):
        model, batch, variables = self._setup()
        f = str(tmp_path / "000000001.pth")
        self._write_pth(variables, f)
        params, stats = cc.load_reference_checkpoint(f, me_order="x_fastest")
        merged, unmatched = cc.merge_into_variables(variables, params, stats)
        assert unmatched == [], unmatched[:10]
        ref = dict(jax.tree_util.tree_leaves_with_path(
            jax.device_get(variables["params"])))
        new = dict(jax.tree_util.tree_leaves_with_path(merged["params"]))
        assert set(ref) == set(new)
        for path, val in ref.items():
            np.testing.assert_allclose(
                np.asarray(new[path]), np.asarray(val), atol=1e-6,
                err_msg=str(path),
            )

    def test_stage1_forward_golden(self, tmp_path):
        """Semantic logits from a converted checkpoint on a fixed scene.

        GOLDEN values generated at round 2 (bf16 conv compute); they pin the
        end-to-end conv layout + BN semantics.  Regenerate ONLY for an
        intentional semantics change:
          pytest tests/test_convert.py -k golden -s  (prints fresh values)
        """
        model, batch, variables = self._setup()
        f = str(tmp_path / "000000001.pth")
        self._write_pth(variables, f)
        params, stats = cc.load_reference_checkpoint(f, me_order="x_fastest")
        merged, _ = cc.merge_into_variables(variables, params, stats)

        ret = jax.jit(
            lambda v, b: model.apply(
                v, b, with_instances=False, with_labels=False, train=False
            )
        )(merged, batch)
        ok = np.asarray(ret["point_ok"])
        logits = np.asarray(ret["sem_pred_score_p"])[ok]
        probe = logits[:: max(1, logits.shape[0] // 8)][:8, :3]
        digest = np.array(
            [float(logits.sum()), float(np.abs(logits).sum()),
             float(logits.max()), float(logits.min())]
        )
        print("\nGOLDEN digest:", repr(digest))
        print("GOLDEN probe:", repr(probe))
        golden_digest = GOLDEN_STAGE1_DIGEST
        golden_probe = GOLDEN_STAGE1_PROBE
        if golden_digest is None:
            pytest.skip("golden values not recorded yet")
        # bf16 conv compute: measured drift vs the f32 reference is ~4e-4
        # relative on the digest and <=1e-5 absolute on the probe, so these
        # bounds (~10x that) still catch any real layout/semantics bug
        np.testing.assert_allclose(digest, golden_digest, rtol=5e-3,
                                   err_msg="stage-1 output drift")
        np.testing.assert_allclose(probe, golden_probe, rtol=2e-2, atol=1e-5,
                                   err_msg="stage-1 output drift (probe)")

    @pytest.mark.slow  # strict-f32 variant of the golden above; the bf16
    # default covers conversion regressions at a third of the compile
    def test_stage1_forward_golden_f32(self, monkeypatch):
        """Strict-parity golden: COMPUTE_DTYPE flipped to f32 (the documented
        parity mode, nn/sparse_ops.py:23).  Exact on a fixed backend (rerun
        diff measured 0.0); tolerances only allow XLA reduction-order changes
        across compiler versions.  A 0.1% logit drift FAILS here — layout
        bugs cannot hide inside bf16 slack (round-2 VERDICT item 7)."""
        import tempfile

        import jax.numpy as jnp

        from pbnet_tpu.nn import sparse_ops

        monkeypatch.setattr(sparse_ops, "COMPUTE_DTYPE", jnp.float32)
        model, batch, variables = self._setup()
        f = os.path.join(tempfile.mkdtemp(), "000000001.pth")
        self._write_pth(variables, f)
        params, stats = cc.load_reference_checkpoint(f, me_order="x_fastest")
        merged, _ = cc.merge_into_variables(variables, params, stats)
        ret = jax.jit(
            lambda v, b: model.apply(
                v, b, with_instances=False, with_labels=False, train=False
            )
        )(merged, batch)
        ok = np.asarray(ret["point_ok"])
        logits = np.asarray(ret["sem_pred_score_p"])[ok]
        probe = logits[:: max(1, logits.shape[0] // 8)][:8, :3]
        digest = np.array(
            [float(logits.sum()), float(np.abs(logits).sum()),
             float(logits.max()), float(logits.min())]
        )
        print("\nGOLDEN f32 digest:", repr(digest))
        print("GOLDEN f32 probe:", repr(probe))
        np.testing.assert_allclose(digest, GOLDEN_STAGE1_DIGEST_F32, rtol=1e-4,
                                   err_msg="f32 stage-1 output drift")
        np.testing.assert_allclose(probe, GOLDEN_STAGE1_PROBE_F32, rtol=1e-3,
                                   atol=1e-7,
                                   err_msg="f32 stage-1 output drift (probe)")


# Regenerated after fixing the missing-neighbor gather: jnp.take(mode="fill")
# wraps index -1 to the LAST row, so -1 kernel-map entries silently added
# feats[cap-1] whenever a level ran at full capacity (the prior goldens baked
# that corruption in).  Missing neighbors now contribute exactly zero, matching
# MinkowskiEngine semantics (reference conv via ME.MinkowskiConvolution).
GOLDEN_STAGE1_DIGEST = np.array(
    [3.79070735e00, 1.40111275e01, 9.43945348e-03, -1.04926862e-02]
)
GOLDEN_STAGE1_PROBE = np.array(
    [[2.6848016e-04, 2.8367020e-04, -1.5183614e-06],
     [5.1325239e-04, -2.1204094e-03, -3.0850612e-03],
     [2.8059629e-04, 3.5928743e-04, -5.8818399e-04],
     [1.3271667e-03, -3.9245514e-04, -1.2040356e-03],
     [-2.7439749e-04, 6.7651374e-05, -1.2861997e-04],
     [6.1068742e-05, -1.9932736e-04, 3.3810604e-05],
     [-7.6885335e-05, -1.7850689e-05, -6.7034288e-04],
     [-5.2560953e-04, -1.2909250e-04, -5.4357201e-04]], dtype=np.float32,
)

# f32 strict-parity goldens (COMPUTE_DTYPE=float32): exact on a fixed backend
GOLDEN_STAGE1_DIGEST_F32 = np.array(
    [3.7924058437e00, 1.4011465073e01, 9.4367293641e-03, -1.0489710607e-02]
)
GOLDEN_STAGE1_PROBE_F32 = np.array(
    [[2.7213609e-04, 2.8468855e-04, -5.3389158e-06],
     [5.0851778e-04, -2.1129041e-03, -3.0816046e-03],
     [2.8111055e-04, 3.5964744e-04, -5.8661419e-04],
     [1.3246582e-03, -3.9256131e-04, -1.2034022e-03],
     [-2.7441460e-04, 6.7300309e-05, -1.2847495e-04],
     [6.2381121e-05, -1.9959640e-04, 3.4696379e-05],
     [-7.7035220e-05, -1.6954698e-05, -6.7002076e-04],
     [-5.2218116e-04, -1.3067848e-04, -5.3989945e-04]], dtype=np.float32,
)
