"""Checkpoint converter tests: synthesize a reference-style torch state dict
from initialized pbnet_tpu variables, convert, and assert full coverage."""

import numpy as np
import jax
import pytest

from pbnet_tpu.tools import convert_checkpoint as cc


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
        from tests.test_pbnet import TINY, synthetic_batch

        from pbnet_tpu.models.pbnet import PBNet

        rng = np.random.RandomState(3)
        batch, _ = synthetic_batch(rng)
        model = PBNet(shapes=TINY)
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
        from tests.test_pbnet import TINY, synthetic_batch

        from pbnet_tpu.models.pbnet import PBNet

        rng = np.random.RandomState(3)
        batch, _ = synthetic_batch(rng)
        model = PBNet(shapes=TINY)
        variables = jax.jit(
            lambda key, b: model.init(
                key, b, with_instances=True, with_labels=True, train=False
            )
        )(jax.random.PRNGKey(7), batch)
        return model, batch, variables

    def _write_pth(self, variables, path):
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
        np.testing.assert_allclose(digest, golden_digest, rtol=2e-2,
                                   err_msg="stage-1 output drift")
        np.testing.assert_allclose(probe, golden_probe, rtol=5e-2, atol=2e-3,
                                   err_msg="stage-1 output drift (probe)")


GOLDEN_STAGE1_DIGEST = np.array(
    [7.01658936e02, 1.29878845e03, 2.27357835e-01, -1.68668374e-01]
)
GOLDEN_STAGE1_PROBE = np.array(
    [[0.10060173, 0.03848581, -0.09091655],
     [0.10165502, 0.03691387, -0.09070564],
     [0.10079956, 0.0381734, -0.0912345],
     [0.10181858, 0.03711214, -0.09059269],
     [0.09954618, 0.03823834, -0.09094474],
     [0.09965239, 0.03800674, -0.09090441],
     [0.10057022, 0.03791448, -0.09218684],
     [0.09851143, 0.03769851, -0.09031052]], dtype=np.float32,
)
