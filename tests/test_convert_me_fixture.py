"""Converter validation against a hand-vendored MinkowskiEngine state-dict
fragment (round-2 VERDICT item 10).

Unlike tests/test_convert.py's synth_state_dict (which inverts the repo's own
rename maps), this fixture is written from the EXTERNAL conventions:

* module names exactly as the reference model defines them
  (/root/reference/network/PBNet.py:38-85 heads as nn.Sequential of
  MinkowskiLinear/MinkowskiBatchNorm/MinkowskiPReLU;
  /root/reference/network/Mink.py:218-291 conv/bn/block names;
  ME examples' BasicBlock: conv1/norm1/conv2/norm2/downsample.{0,1})
* MinkowskiEngine parameter conventions: MinkowskiConvolution stores
  ``kernel`` of shape (K^3, Cin, Cout) for kernel_volume > 1 and (Cin, Cout)
  for 1x1 convs; MinkowskiBatchNorm wraps torch BatchNorm1d as ``bn.*`` incl.
  ``num_batches_tracked``; MinkowskiLinear wraps torch Linear as ``linear.*``
  with (Cout, Cin) weight; MinkowskiPReLU stores ``weight`` of shape (1,);
  kernel offsets enumerate x-FASTEST (ME kernel_region: z outer, x inner).

If a converter layout assumption (offset order, kernel axis order, BN
wrapping, head indexing) is wrong w.r.t. these conventions, this test fails
where the self-derived round-trip cannot.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbnet_tpu.tools import convert_checkpoint as cc


def me_x_fastest_offsets(k):
    r = range(-(k // 2), k // 2 + 1) if k % 2 == 1 else range(0, k)
    return [(dx, dy, dz) for dz in r for dy in r for dx in r]


def make_me_fragment(rng):
    """Hand-written ME-format fragment covering every converter code path:
    k=5 stem, k=3 block convs, k=2 strided + transpose convs, 1x1 downsample,
    BN (incl. num_batches_tracked), final 1x1 head, MLP heads with PReLU.
    Shapes follow the real MinkUNet34C channel plan."""
    def t(*shape):
        return rng.randn(*shape).astype(np.float32)

    def bn(prefix, c, sd):
        sd[f"{prefix}.bn.weight"] = t(c)
        sd[f"{prefix}.bn.bias"] = t(c)
        sd[f"{prefix}.bn.running_mean"] = t(c)
        sd[f"{prefix}.bn.running_var"] = np.abs(t(c)) + 0.5
        sd[f"{prefix}.bn.num_batches_tracked"] = np.int64(520)

    sd = {}
    # stem k=5 (Mink.py:218-224) + bn0
    sd["MEUnet.conv0p1s1.kernel"] = t(125, 6, 32)
    bn("MEUnet.bn0", 32, sd)
    # strided conv k=2 s=2 + bn1 (Mink.py:226-231)
    sd["MEUnet.conv1p1s2.kernel"] = t(8, 32, 32)
    bn("MEUnet.bn1", 32, sd)
    # encoder block1.0: BasicBlock conv1/norm1/conv2/norm2 (ME resnet_block)
    sd["MEUnet.block1.0.conv1.kernel"] = t(27, 32, 32)
    bn("MEUnet.block1.0.norm1", 32, sd)
    sd["MEUnet.block1.0.conv2.kernel"] = t(27, 32, 32)
    bn("MEUnet.block1.0.norm2", 32, sd)
    # transpose conv into the decoder (Mink.py:253-258)
    sd["MEUnet.convtr4p16s2.kernel"] = t(8, 256, 256)
    bn("MEUnet.bntr4", 256, sd)
    # decoder block5.0 with 1x1 downsample (inplanes 256+128 -> 256)
    sd["MEUnet.block5.0.conv1.kernel"] = t(27, 384, 256)
    bn("MEUnet.block5.0.norm1", 256, sd)
    sd["MEUnet.block5.0.conv2.kernel"] = t(27, 256, 256)
    bn("MEUnet.block5.0.norm2", 256, sd)
    sd["MEUnet.block5.0.downsample.0.kernel"] = t(384, 256)  # 1x1: 2-D in ME
    bn("MEUnet.block5.0.downsample.1", 256, sd)
    # final 1x1 conv with bias (Mink.py:282-287): 2-D kernel + bias
    sd["MEUnet.final_sematic.kernel"] = t(96, 32)
    sd["MEUnet.final_sematic.bias"] = t(32)
    # semantic head (PBNet.py:43-48): Linear(32,16,bias=False) + BN + PReLU +
    # Linear(16,20,bias=True); torch Linear weight is (out, in)
    sd["linear_sem.0.linear.weight"] = t(16, 32)
    bn("linear_sem.1", 16, sd)
    sd["linear_sem.2.weight"] = t(1)  # PReLU single alpha
    sd["linear_sem.3.linear.weight"] = t(20, 16)
    sd["linear_sem.3.linear.bias"] = t(20)
    return sd


def make_me_full_state_dict(rng):
    """The COMPLETE reference checkpoint in ME format: every parameter of
    MinkUNet34C (MEUnet), MinkUNet14A (D_Unet), MinkUNet34C (score_Unet) and
    the five MLP heads, written from the reference's channel arithmetic
    (/root/reference/network/Mink.py:202-290 planes/layers tables,
    /root/reference/network/PBNet.py:43-92 heads) — NOT from this repo's
    rename maps.  Pins every rename path on an externally-derived artifact
    (round-3 VERDICT item 9)."""
    def t(*shape):
        return rng.randn(*shape).astype(np.float32)

    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.bn.weight"] = t(c)
        sd[f"{prefix}.bn.bias"] = t(c)
        sd[f"{prefix}.bn.running_mean"] = t(c)
        sd[f"{prefix}.bn.running_var"] = np.abs(t(c)) + 0.5
        sd[f"{prefix}.bn.num_batches_tracked"] = np.int64(520)

    def block(prefix, cin, planes):
        sd[f"{prefix}.conv1.kernel"] = t(27, cin, planes)
        bn(f"{prefix}.norm1", planes)
        sd[f"{prefix}.conv2.kernel"] = t(27, planes, planes)
        bn(f"{prefix}.norm2", planes)
        if cin != planes:
            sd[f"{prefix}.downsample.0.kernel"] = t(cin, planes)
            bn(f"{prefix}.downsample.1", planes)

    def unet(top, in_ch, out_ch, layers, planes, init_dim=32):
        sd[f"{top}.conv0p1s1.kernel"] = t(125, in_ch, init_dim)
        bn(f"{top}.bn0", init_dim)
        ch = init_dim
        enc = []
        for s in range(4):
            sd[f"{top}.conv{s+1}p{2**s}s2.kernel"] = t(8, ch, ch)
            bn(f"{top}.bn{s+1}", ch)
            c = ch
            for i in range(layers[s]):
                block(f"{top}.block{s+1}.{i}", c, planes[s])
                c = planes[s]
            ch = planes[s]
            enc.append(ch)
        skips = [enc[2], enc[1], enc[0], init_dim]
        for d in range(4):
            sd[f"{top}.convtr{4+d}p{2**(4-d)}s2.kernel"] = t(
                8, ch, planes[4 + d])
            bn(f"{top}.bntr{4+d}", planes[4 + d])
            c = planes[4 + d] + skips[d]
            for i in range(layers[4 + d]):
                block(f"{top}.block{5+d}.{i}", c, planes[4 + d])
                c = planes[4 + d]
            ch = planes[4 + d]
        sd[f"{top}.final_sematic.kernel"] = t(ch, out_ch)
        sd[f"{top}.final_sematic.bias"] = t(out_ch)

    P34 = (32, 64, 128, 256, 256, 128, 96, 96)
    L34 = (2, 3, 4, 6, 2, 2, 2, 2)
    P14 = (32, 64, 128, 256, 128, 128, 96, 96)
    L14 = (1,) * 8
    unet("MEUnet", 6, 32, L34, P34)
    unet("D_Unet", 34, 32, L14, P14)
    unet("score_Unet", 32, 32, L34, P34)

    def head(name, cin, hidden, out):
        sd[f"{name}.0.linear.weight"] = t(hidden, cin)
        bn(f"{name}.1", hidden)
        sd[f"{name}.2.weight"] = t(1)
        sd[f"{name}.3.linear.weight"] = t(out, hidden)
        sd[f"{name}.3.linear.bias"] = t(out)

    head("linear_sem", 32, 16, 20)
    head("linear_offset", 32, 16, 3)
    head("linear_binary", 32, 16, 1)
    head("linear_IOU_feat", 32, 32, 32)
    head("linear_IOU", 32, 16, 1)
    return sd


@pytest.fixture(scope="module")
def full_model_variables():
    from tests.test_convert import shapes5
    from tests.test_pbnet import synthetic_batch
    from pbnet_tpu.models.pbnet import PBNet

    batch, _ = synthetic_batch(np.random.RandomState(3))
    # full-depth shapes: default archs need a 5-level pyramid
    model = PBNet(shapes=shapes5())
    variables = jax.jit(
        lambda key, b: model.init(
            key, b, with_instances=True, with_labels=True, train=False
        )
    )(jax.random.PRNGKey(0), batch)
    return variables


class TestMeFixture:
    def test_fragment_lands_on_model_tree(self, rng, full_model_variables):
        variables = full_model_variables

        sd = make_me_fragment(rng)
        params, stats = cc.convert_state_dict(sd, me_order="x_fastest")
        merged, unmatched = cc.merge_into_variables(variables, params, stats)
        assert unmatched == [], unmatched

        p = merged["params"]
        s = merged["batch_stats"]
        # every fixture tensor landed where the model expects it
        np.testing.assert_allclose(
            np.asarray(p["MEUnet"]["conv0"]["kernel"]),
            sd["MEUnet.conv0p1s1.kernel"][cc.me_offset_permutation(5)],
        )
        np.testing.assert_allclose(
            np.asarray(p["MEUnet"]["block1_0"]["conv1"]["kernel"]),
            sd["MEUnet.block1.0.conv1.kernel"][cc.me_offset_permutation(3)],
        )
        np.testing.assert_allclose(
            np.asarray(p["MEUnet"]["convtr4"]["kernel"]),
            sd["MEUnet.convtr4p16s2.kernel"][cc.me_offset_permutation(2)],
        )
        np.testing.assert_allclose(
            np.asarray(
                p["MEUnet"]["block5_0"]["downsample_conv"]["Dense_0"]["kernel"]
            ),
            sd["MEUnet.block5.0.downsample.0.kernel"],
        )
        np.testing.assert_allclose(
            np.asarray(p["MEUnet"]["final"]["Dense_0"]["bias"]),
            sd["MEUnet.final_sematic.bias"],
        )
        np.testing.assert_allclose(
            np.asarray(p["linear_sem"]["linear1"]["Dense_0"]["kernel"]),
            sd["linear_sem.0.linear.weight"].T,
        )
        np.testing.assert_allclose(
            np.asarray(p["linear_sem"]["prelu"]["alpha"]),
            sd["linear_sem.2.weight"],
        )
        np.testing.assert_allclose(
            np.asarray(s["MEUnet"]["bn0"]["var"]),
            sd["MEUnet.bn0.bn.running_var"],
        )

    def test_full_depth_checkpoint_overwrites_every_leaf(
            self, rng, full_model_variables):
        """The complete 34C/14A/34C + 5-head ME-format checkpoint must land
        with nothing unmatched AND overwrite EVERY param/batch-stat leaf of
        the model — so no rename path (all 8 stages x 3 UNets, every
        downsample, every head) can silently fall through to init values."""
        variables = full_model_variables
        sd = make_me_full_state_dict(rng)
        params, stats = cc.convert_state_dict(sd, me_order="x_fastest")
        merged, unmatched = cc.merge_into_variables(variables, params, stats)
        assert unmatched == [], unmatched[:20]

        untouched = []
        for col in ("params", "batch_stats"):
            ref = dict(jax.tree_util.tree_leaves_with_path(
                jax.device_get(variables[col])))
            for path, leaf in jax.tree_util.tree_leaves_with_path(
                    merged[col]):
                if np.array_equal(np.asarray(leaf), np.asarray(ref[path])):
                    untouched.append((col,) + tuple(str(p) for p in path))
        assert untouched == [], (len(untouched), untouched[:20])

    def test_directional_offset_semantics(self):
        """A kernel that is nonzero ONLY at ME offset (dx,dy,dz)=(1,0,0) must,
        after conversion, make output voxel o read input voxel o+(1,0,0) —
        pins the offset enumeration end to end (converter + kernel map +
        gather conv) rather than just round-tripping the permutation."""
        from pbnet_tpu.core import topology as tp
        from pbnet_tpu.models.pbnet import make_level0
        from pbnet_tpu.nn import sparse_ops

        # a 4-voxel line along x at y=z=0
        coords = np.zeros((8, 4), np.int32)
        coords[:4, 1] = np.arange(4)
        valid = np.arange(8) < 4
        level, _ = make_level0(
            jnp.asarray(coords), jnp.zeros((8, 1), jnp.float32),
            jnp.asarray(valid),
        )
        kmap = tp.conv_map(level, level, 3)

        me_kernel = np.zeros((27, 1, 1), np.float32)
        me_idx = me_x_fastest_offsets(3).index((1, 0, 0))
        me_kernel[me_idx] = 1.0
        ours = cc._conv_kernel(me_kernel, "x_fastest")

        feats = jnp.asarray(
            np.where(valid, np.arange(8) + 1.0, 0.0)[:, None].astype(
                np.float32
            )
        )
        y = sparse_ops.gather_conv(
            feats, kmap, jnp.asarray(ours), level.valid
        )
        # level rows are key-sorted: voxel x=i is row i. y[i] = feats at
        # x=i+1 (missing neighbor at the line end contributes zero).
        got = np.asarray(y)[:4, 0]
        np.testing.assert_allclose(got, [2.0, 3.0, 4.0, 0.0], atol=1e-5)
