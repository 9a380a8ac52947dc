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
