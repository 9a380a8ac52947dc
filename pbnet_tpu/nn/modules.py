"""Flax modules for sparse tensors: conv, norm, activations, residual blocks.

These mirror the MinkowskiEngine modules the reference composes
(/root/reference/network/Mink.py, /root/reference/network/PBNet.py:43-85) but
operate on padded dense feature arrays + validity masks, with kernel maps
passed in from the topology builder.

Conventions:
* Feature arrays are (M, C) with invalid rows kept at exactly 0 by masking
  after every layer (so kernel-map gathers of missing neighbors read zeros).
* BatchNorm keeps torch semantics: momentum 0.1 (new = 0.9*old + 0.1*batch),
  eps 1e-5, unbiased running variance; cross-replica stats via ``axis_name``
  reproduce SyncBatchNorm (/root/reference/train.py:343-344).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import sparse_ops


def kaiming_conv_init(key, shape, dtype=jnp.float32):
    """Kaiming-normal fan_out/relu for (K, Cin, Cout) sparse-conv kernels,
    matching ME.utils.kaiming_normal_ (/root/reference/network/Mink.py:69)."""
    k, _, cout = shape
    std = (2.0 / (k * cout)) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


class SparseConv(nn.Module):
    """Sparse convolution driven by a precomputed kernel map.

    ``kmap_bwd`` (the transposed kernel map, see sparse_ops._gather_conv_core)
    turns the backward pass into gathers instead of scatter-adds — pass it
    wherever the topology provides one.
    """

    features: int
    kernel_volume: int
    use_bias: bool = False  # ME MinkowskiConvolution default

    @nn.compact
    def __call__(self, feats, kmap, valid_out, kmap_bwd=None,
                 dense_plan=None, plan=None, zmasks=None,
                 single_present=False):
        cin = feats.shape[-1]
        w = self.param(
            "kernel", kaiming_conv_init, (self.kernel_volume, cin, self.features)
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if dense_plan is not None:
            # coarse-level dense-grid path (see sparse_ops.DensePlan); same
            # params/semantics, no kernel map needed
            return sparse_ops.dense_conv(feats, dense_plan, w, valid_out, b)
        return sparse_ops.gather_conv(feats, kmap, w, valid_out, b,
                                      kmap_bwd=kmap_bwd, plan=plan,
                                      zmasks=zmasks,
                                      single_present=single_present)


class SparseLinear(nn.Module):
    """Pointwise linear (ME MinkowskiLinear / kernel-size-1 conv)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, feats, valid):
        y = nn.Dense(self.features, use_bias=self.use_bias)(feats)
        return jnp.where(valid[:, None], y, 0.0)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid rows with torch semantics + optional SyncBN."""

    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, valid, train: bool):
        c = feats.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,))
        beta = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, (c,))
        ra_var = self.variable("batch_stats", "var", jnp.ones, (c,))

        if train:
            vmask = valid[:, None].astype(feats.dtype)
            cnt = jnp.sum(vmask)
            s = jnp.sum(feats * vmask, axis=0)
            ss = jnp.sum((feats * feats) * vmask, axis=0)
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s = jax.lax.psum(s, self.axis_name)
                ss = jax.lax.psum(ss, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s / cnt
            var = jnp.maximum(ss / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (feats - mean) * jax.lax.rsqrt(var + self.eps) * gamma + beta
        return jnp.where(valid[:, None], y, 0.0)


class MaskedInstanceNorm(nn.Module):
    """Per-batch-item feature normalization (ME MinkowskiInstanceNorm,
    used by the ResNet classifier family, /root/reference/network/Mink.py:35)."""

    eps: float = 1e-5
    num_batch: int = 8

    @nn.compact
    def __call__(self, feats, batch_ids, valid):
        c = feats.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,))
        beta = self.param("bias", nn.initializers.zeros, (c,))
        nb = self.num_batch
        seg = jnp.where(valid, batch_ids, nb)
        vmask = valid[:, None].astype(feats.dtype)
        cnt = jax.ops.segment_sum(vmask[:, 0], seg, num_segments=nb + 1)
        s = jax.ops.segment_sum(feats * vmask, seg, num_segments=nb + 1)
        ss = jax.ops.segment_sum(feats * feats * vmask, seg, num_segments=nb + 1)
        cnt = jnp.maximum(cnt, 1.0)[:, None]
        mean = s / cnt
        var = jnp.maximum(ss / cnt - mean * mean, 0.0)
        y = (feats - mean[seg.clip(0, nb)]) * jax.lax.rsqrt(
            var[seg.clip(0, nb)] + self.eps
        ) * gamma + beta
        return jnp.where(valid[:, None], y, 0.0)


class PReLU(nn.Module):
    """Single-parameter PReLU (torch nn.PReLU default, init 0.25)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, alpha * x)


def relu(x):
    return jax.nn.relu(x)


class BasicBlock(nn.Module):
    """ME resnet_block.BasicBlock: conv3-BN-relu-conv3-BN + skip -> relu.

    (MinkowskiEngine/modules/resnet_block.py, imported at
    /root/reference/network/Mink.py:11.)
    """

    planes: int
    axis_name: Optional[str] = None
    expansion: int = 1

    @nn.compact
    def __call__(self, feats, kmap3, valid, train: bool, dense_plan=None,
                 plan=None, zmasks=None):
        inplanes = feats.shape[-1]
        kb = kmap3[:, ::-1]  # same-level symmetric offsets: transpose = flip
        y = SparseConv(self.planes, kmap3.shape[1], name="conv1")(
            feats, kmap3, valid, kmap_bwd=kb, dense_plan=dense_plan, plan=plan,
            zmasks=zmasks)
        y = MaskedBatchNorm(axis_name=self.axis_name, name="norm1")(y, valid, train)
        y = relu(y)
        y = SparseConv(self.planes, kmap3.shape[1], name="conv2")(
            y, kmap3, valid, kmap_bwd=kb, dense_plan=dense_plan, plan=plan,
            zmasks=zmasks)
        y = MaskedBatchNorm(axis_name=self.axis_name, name="norm2")(y, valid, train)
        if inplanes != self.planes * self.expansion:
            skip = SparseLinear(self.planes * self.expansion, use_bias=False,
                                name="downsample_conv")(feats, valid)
            skip = MaskedBatchNorm(axis_name=self.axis_name,
                                   name="downsample_norm")(skip, valid, train)
        else:
            skip = feats
        return relu(y + skip)


class Bottleneck(nn.Module):
    """ME resnet_block.Bottleneck (1x1 -> 3x3 -> 1x1, expansion 4)."""

    planes: int
    axis_name: Optional[str] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, feats, kmap3, valid, train: bool, dense_plan=None,
                 plan=None, zmasks=None):
        inplanes = feats.shape[-1]
        y = SparseLinear(self.planes, use_bias=False, name="conv1")(feats, valid)
        y = MaskedBatchNorm(axis_name=self.axis_name, name="norm1")(y, valid, train)
        y = relu(y)
        y = SparseConv(self.planes, kmap3.shape[1], name="conv2")(
            y, kmap3, valid, kmap_bwd=kmap3[:, ::-1], dense_plan=dense_plan,
            plan=plan, zmasks=zmasks)
        y = MaskedBatchNorm(axis_name=self.axis_name, name="norm2")(y, valid, train)
        y = relu(y)
        y = SparseLinear(self.planes * self.expansion, use_bias=False,
                         name="conv3")(y, valid)
        y = MaskedBatchNorm(axis_name=self.axis_name, name="norm3")(y, valid, train)
        if inplanes != self.planes * self.expansion:
            skip = SparseLinear(self.planes * self.expansion, use_bias=False,
                                name="downsample_conv")(feats, valid)
            skip = MaskedBatchNorm(axis_name=self.axis_name,
                                   name="downsample_norm")(skip, valid, train)
        else:
            skip = feats
        return relu(y + skip)


BLOCKS: dict[str, Any] = {"basic": BasicBlock, "bottleneck": Bottleneck}
BLOCK_EXPANSION = {"basic": 1, "bottleneck": 4}


class MLPHead(nn.Module):
    """The reference's head pattern: Linear(bias=False)-BN-PReLU-Linear
    (/root/reference/network/PBNet.py:43-82)."""

    hidden: int
    out: int
    axis_name: Optional[str] = None
    final_sigmoid: bool = False

    @nn.compact
    def __call__(self, feats, valid, train: bool):
        y = SparseLinear(self.hidden, use_bias=False, name="linear1")(feats, valid)
        y = MaskedBatchNorm(axis_name=self.axis_name, name="norm")(y, valid, train)
        y = PReLU(name="prelu")(y)
        y = jnp.where(valid[:, None], y, 0.0)
        y = SparseLinear(self.out, use_bias=True, name="linear2")(y, valid)
        if self.final_sigmoid:
            y = jax.nn.sigmoid(y)
            y = jnp.where(valid[:, None], y, 0.0)
        return y
