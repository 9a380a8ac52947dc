"""Sparse ResNet classifier family (capability parity with
/root/reference/network/Mink.py:14-198: ResNet14/18/34/50/101).

Structure: conv k3 s2 + InstanceNorm + ReLU + maxpool k2 s2, four residual
stages each entered with a stride-2 conv (1x1 stride-2 downsample skip), a
dropout + k3 s3 conv + InstanceNorm + GELU head, global max pooling and a
final linear classifier.

The ResFieldNet variants (/root/reference/network/Mink.py:145-198) prefix
the classifier with two TensorField blocks: a sinusoidal (Fourier-feature)
per-POINT embedding + BN/ReLU/Linear/BN/ReLU, pooled to voxels
(ToSparseTensor = per-voxel mean of member points), with the second block
consuming cat_slice (voxel features sliced back to points, concatenated
with the raw point features).  Here the TensorField is (point features,
point->voxel map, point validity); pooling is a masked segment-mean and
slicing a row gather.  NOTE: MinkowskiSinusoidal's exact parameterization
is approximated as sin(x @ W + b) (no network access to pin ME's source in
this environment); the family is otherwise structurally exact.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

import flax.struct

from ..core import topology as tp
from . import sparse_ops
from .modules import (
    BLOCK_EXPANSION, MaskedBatchNorm, MaskedInstanceNorm, SparseConv,
    SparseLinear, relu,
)


@flax.struct.dataclass
class ResNetTopology:
    """Levels + kernel maps for the classifier pyramid.

    levels: strides (2, 4, 8, 16, 32, 64, 192) relative to the input level.
    """

    levels: tuple
    stem_map: jnp.ndarray  # k3 s2: input -> levels[0]
    pool_map: jnp.ndarray  # k2 s2: levels[0] -> levels[1]
    stage_down_maps: tuple  # k3 s2 maps entering each residual stage
    stage_skip_maps: tuple  # k1 s2 maps for the downsample skips
    stage_k3_maps: tuple  # k3 s1 maps inside each stage
    head_map: jnp.ndarray  # k3 s3: levels[5] -> levels[6]


def build_resnet_topology(level0: tp.SparseLevel, caps: Sequence[int]) -> ResNetTopology:
    """caps: capacities for the 7 derived levels."""
    l_in = level0
    levels = []
    # conv1 k3 s2
    l1 = tp.downsample(l_in, 2, caps[0])
    stem = tp.conv_map(l1, l_in, 3)
    levels.append(l1)
    # maxpool k2 s2
    l2 = tp.downsample(l1, 2, caps[1])
    pool = tp.conv_map(l2, l1, 2)
    levels.append(l2)
    # 4 stages, stride 2 each
    downs, skips, k3s = [], [], []
    cur = l2
    for s in range(4):
        nxt = tp.downsample(cur, 2, caps[2 + s])
        downs.append(tp.conv_map(nxt, cur, 3))
        skips.append(tp.conv_map(nxt, cur, 1))
        k3s.append(tp.conv_map(nxt, nxt, 3))
        levels.append(nxt)
        cur = nxt
    # conv5 k3 s3
    l7 = tp.downsample(cur, 3, caps[6])
    head = tp.conv_map(l7, cur, 3)
    levels.append(l7)
    return ResNetTopology(
        levels=tuple(levels), stem_map=stem, pool_map=pool,
        stage_down_maps=tuple(downs), stage_skip_maps=tuple(skips),
        stage_k3_maps=tuple(k3s), head_map=head,
    )


class StridedBasicBlock(nn.Module):
    """BasicBlock whose first conv is strided (stage entry)."""

    planes: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, down_map, skip_map, k3_map, valid_out, train):
        y = SparseConv(self.planes, down_map.shape[1], name="conv1")(
            feats, down_map, valid_out
        )
        y = MaskedBatchNorm(axis_name=self.axis_name, name="norm1")(y, valid_out, train)
        y = relu(y)
        y = SparseConv(self.planes, k3_map.shape[1], name="conv2")(y, k3_map, valid_out)
        y = MaskedBatchNorm(axis_name=self.axis_name, name="norm2")(y, valid_out, train)
        skip = SparseConv(self.planes, 1, name="downsample_conv")(
            feats, skip_map, valid_out
        )
        skip = MaskedBatchNorm(axis_name=self.axis_name, name="downsample_norm")(
            skip, valid_out, train
        )
        return relu(y + skip)


class StridedBottleneck(nn.Module):
    """Bottleneck whose 3x3 conv is strided (stage entry), expansion 4
    (ME resnet_block.Bottleneck with stride=2 + downsample, used by
    ResNet50/101, /root/reference/network/Mink.py:136-142)."""

    planes: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, down_map, skip_map, k3_map, valid_out, train,
                 valid_in=None):
        del k3_map  # the strided conv IS the 3x3; in-stage k3 not needed here
        if valid_in is None:  # feats rows are masked-0, so linear(0)=0 anyway
            valid_in = jnp.ones(feats.shape[0], bool)
        y = SparseLinear(self.planes, use_bias=False, name="conv1")(feats, valid_in)
        y = MaskedBatchNorm(axis_name=self.axis_name, name="norm1")(y, valid_in, train)
        y = relu(y)
        y = SparseConv(self.planes, down_map.shape[1], name="conv2")(
            y, down_map, valid_out
        )
        y = MaskedBatchNorm(axis_name=self.axis_name, name="norm2")(y, valid_out, train)
        y = relu(y)
        y = SparseLinear(self.planes * 4, use_bias=False, name="conv3")(y, valid_out)
        y = MaskedBatchNorm(axis_name=self.axis_name, name="norm3")(y, valid_out, train)
        skip = SparseConv(self.planes * 4, 1, name="downsample_conv")(
            feats, skip_map, valid_out
        )
        skip = MaskedBatchNorm(axis_name=self.axis_name, name="downsample_norm")(
            skip, valid_out, train
        )
        return relu(y + skip)


class SparseResNet(nn.Module):
    """ResNetBase (/root/reference/network/Mink.py:14-117) on the TPU engine."""

    out_channels: int
    layers: Sequence[int] = (1, 1, 1, 1)
    planes: Sequence[int] = (64, 128, 256, 512)
    init_dim: int = 64
    block: str = "basic"
    dropout_rate: float = 0.5
    num_batch: int = 8
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, topo: ResNetTopology, feats, batch_ids_per_level,
                 train: bool, dropout_rng=None):
        from .modules import BLOCKS

        in_block = BLOCKS[self.block]
        entry_block = (
            StridedBottleneck if self.block == "bottleneck" else StridedBasicBlock
        )
        lv = topo.levels
        v = [l.valid for l in lv]
        # stem: conv k3 s2 + InstanceNorm + ReLU + maxpool
        x = SparseConv(self.init_dim, topo.stem_map.shape[1], name="conv1")(
            feats, topo.stem_map, v[0]
        )
        x = MaskedInstanceNorm(name="in1")(x, batch_ids_per_level[0], v[0])
        x = relu(x)
        x = sparse_ops.max_pool(x, topo.pool_map, v[1])

        for s in range(4):
            x = entry_block(
                self.planes[s], axis_name=self.axis_name, name=f"layer{s+1}_0"
            )(x, topo.stage_down_maps[s], topo.stage_skip_maps[s],
              topo.stage_k3_maps[s], v[2 + s], train)
            for i in range(1, self.layers[s]):
                x = in_block(
                    self.planes[s], axis_name=self.axis_name,
                    name=f"layer{s+1}_{i}",
                )(x, topo.stage_k3_maps[s], v[2 + s], train)

        # head: dropout + conv k3 s3 + InstanceNorm + GELU
        if train and dropout_rng is not None:
            keep = jax.random.bernoulli(
                dropout_rng, 1.0 - self.dropout_rate, (x.shape[0], 1)
            )
            x = x * keep / (1.0 - self.dropout_rate)
        x = SparseConv(self.planes[3], topo.head_map.shape[1], name="conv5")(
            x, topo.head_map, v[6]
        )
        x = MaskedInstanceNorm(name="in5")(x, batch_ids_per_level[6], v[6])
        x = jax.nn.gelu(x)
        x = jnp.where(v[6][:, None], x, 0.0)

        # global max pool per batch item + final linear
        pooled = sparse_ops.global_pool(
            x, batch_ids_per_level[6], v[6], self.num_batch, "max"
        )
        return nn.Dense(self.out_channels, use_bias=True, name="final")(pooled)


class SparseResFieldNet(nn.Module):
    """ResFieldNetBase (/root/reference/network/Mink.py:145-173): two
    sinusoidal field blocks over the point 'TensorField', then the sparse
    ResNet classifier on the pooled voxel features."""

    out_channels: int
    layers: Sequence[int] = (1, 1, 1, 1)
    planes: Sequence[int] = (64, 128, 256, 512)
    block: str = "basic"
    field_ch: int = 32
    field_ch2: int = 64
    num_batch: int = 8
    axis_name: Optional[str] = None

    def _field(self, x, pvalid, ch, train, name):
        y = jnp.sin(nn.Dense(ch, name=f"{name}_sinusoidal")(x))
        y = jnp.where(pvalid[:, None], y, 0.0)
        y = MaskedBatchNorm(axis_name=self.axis_name, name=f"{name}_bn1")(
            y, pvalid, train)
        y = relu(y)
        y = nn.Dense(ch, name=f"{name}_linear")(y)
        y = jnp.where(pvalid[:, None], y, 0.0)
        y = MaskedBatchNorm(axis_name=self.axis_name, name=f"{name}_bn2")(
            y, pvalid, train)
        return relu(y)

    def _to_sparse(self, y, p2v, pvalid, cap):
        """ToSparseTensor: per-voxel MEAN of member point features."""
        seg = jnp.where(pvalid & (p2v >= 0), p2v, cap)
        s = jax.ops.segment_sum(
            jnp.where(pvalid[:, None], y, 0.0), seg, num_segments=cap + 1
        )[:cap]
        c = jax.ops.segment_sum(
            (pvalid & (p2v >= 0)).astype(y.dtype), seg, num_segments=cap + 1
        )[:cap]
        return s / jnp.maximum(c, 1.0)[:, None]

    @nn.compact
    def __call__(self, topo: ResNetTopology, point_feats, p2v, point_valid,
                 in_level_valid, batch_ids_per_level, train: bool,
                 dropout_rng=None):
        """point_feats (P, Cin) on the TensorField; p2v (P,) row in the
        classifier's INPUT voxel level (the level build_resnet_topology was
        given); in_level_valid (V,) that level's validity."""
        cap = in_level_valid.shape[0]
        y1 = self._field(point_feats, point_valid, self.field_ch, train,
                         "field1")
        v1 = self._to_sparse(y1, p2v, point_valid, cap)
        # cat_slice: voxel features back at the points + raw point features
        sl = jnp.take(v1, jnp.clip(p2v, 0, cap - 1), axis=0)
        sl = jnp.where((point_valid & (p2v >= 0))[:, None], sl, 0.0)
        y2 = self._field(
            jnp.concatenate([sl, point_feats], axis=1), point_valid,
            self.field_ch2, train, "field2",
        )
        v2 = self._to_sparse(y2, p2v, point_valid, cap)
        v2 = jnp.where(in_level_valid[:, None], v2, 0.0)
        return SparseResNet(
            out_channels=self.out_channels, layers=self.layers,
            planes=self.planes, block=self.block, num_batch=self.num_batch,
            axis_name=self.axis_name, name="resnet",
        )(topo, v2, batch_ids_per_level, train, dropout_rng)


RESNET_ARCHS = {
    "ResNet14": dict(layers=(1, 1, 1, 1)),
    "ResNet18": dict(layers=(2, 2, 2, 2)),
    "ResNet34": dict(layers=(3, 4, 6, 3)),
    "ResNet50": dict(layers=(3, 4, 6, 3), block="bottleneck"),
    "ResNet101": dict(layers=(3, 4, 23, 3), block="bottleneck"),
}


def sparse_resnet(out_channels: int, arch: str = "ResNet14", axis_name=None):
    if arch not in RESNET_ARCHS:
        raise ValueError(f"unknown ResNet arch {arch}")
    return SparseResNet(out_channels=out_channels, axis_name=axis_name,
                        **RESNET_ARCHS[arch])


RESFIELD_ARCHS = {
    "ResFieldNet14": dict(layers=(1, 1, 1, 1)),
    "ResFieldNet18": dict(layers=(2, 2, 2, 2)),
    "ResFieldNet34": dict(layers=(3, 4, 6, 3)),
    "ResFieldNet50": dict(layers=(3, 4, 6, 3), block="bottleneck"),
    "ResFieldNet101": dict(layers=(3, 4, 23, 3), block="bottleneck"),
}


def sparse_resfieldnet(out_channels: int, arch: str = "ResFieldNet14",
                       axis_name=None):
    """Factory for the TensorField classifier family
    (/root/reference/network/Mink.py:175-198)."""
    if arch not in RESFIELD_ARCHS:
        raise ValueError(f"unknown ResFieldNet arch {arch}")
    return SparseResFieldNet(out_channels=out_channels, axis_name=axis_name,
                             **RESFIELD_ARCHS[arch])
