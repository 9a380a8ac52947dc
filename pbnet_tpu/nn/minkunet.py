"""MinkUNet family on the TPU sparse engine.

Exact channel plans / layer counts of the reference
(/root/reference/network/Mink.py:202-419, Mini UNet :423-499):

* MinkUNetBase: stem k=5 conv -> 4 encoder stages (k=2 s=2 conv + residual
  blocks) -> 4 decoder stages (k=2 s=2 transposed conv + skip concat +
  residual blocks) -> 1x1 head.
* Mink_Mini_Unet: 2-level variant used as 'Mini_Unet'.

Kernel maps come from a precomputed :class:`~pbnet_tpu.core.topology
.UNetTopology`; all residual blocks at one stride share one k=3 map.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..core.topology import DenseGrid, UNetTopology
from . import sparse_ops
from .modules import BLOCKS, BLOCK_EXPANSION, MaskedBatchNorm, SparseConv, SparseLinear, relu


def _stem_conv(init_dim, topo: UNetTopology, feats, valid0):
    """The k=5 stem conv off the topology's stem kernel map ('conv0')."""
    conv = SparseConv(init_dim, topo.stem_map.shape[1], name="conv0")
    return conv(feats, topo.stem_map, valid0,
                kmap_bwd=topo.stem_map[:, ::-1])


# Levels whose dense grid has at most this many cells run their convs on the
# dense grid (scatter -> MXU conv -> gather) instead of gather-GEMM.  With
# monotone per-group gathers the sparse path wins down to surprisingly
# coarse levels (L1 7.0 vs 18.3 ms, L2 2.9 vs 3.4 on real topology,
# _scratch/micro_dense.py); only the smallest grids (L3/L4 at a single-scene
# eval extent: <= ~20k cells) tie or edge out sparse, where the scatter/
# gather pair is trivial and the conv is one fused MXU pass.
DENSE_MAX_CELLS = 30_000


def _dense_cells(topo: UNetTopology):
    """Per-level flat cell indices + dims where the dense-grid path applies."""
    n = len(topo.levels)
    idx = [None] * n
    dims = [None] * n
    grids = topo.grids or ()
    for l, lv in enumerate(topo.levels):
        g = grids[l] if l < len(grids) else None
        if not isinstance(g, DenseGrid) or g.dims is None:
            continue
        if g.dims[0] * g.dims[1] * g.dims[2] * g.dims[3] > DENSE_MAX_CELLS:
            continue
        idx[l] = sparse_ops.cell_index(lv.coords, lv.valid, g.dims, lv.stride)
        dims[l] = g.dims
    return idx, dims


def _same_plan(idx, dims, l):
    if idx[l] is None:
        return None
    return sparse_ops.DensePlan(in_idx=idx[l], out_idx=idx[l], mode="same",
                                dims_in=dims[l], dims_out=dims[l])


def _pair_plan(idx, dims, fine, mode):
    """down: fine -> fine+1; up: fine+1 -> fine.  Dense only when the FINE
    grid (the big operand) is below the cell gate."""
    if idx[fine] is None or idx[fine + 1] is None:
        return None
    if mode == "down":
        return sparse_ops.DensePlan(
            in_idx=idx[fine], out_idx=idx[fine + 1], mode="down",
            dims_in=dims[fine], dims_out=dims[fine + 1])
    return sparse_ops.DensePlan(
        in_idx=idx[fine + 1], out_idx=idx[fine], mode="up",
        dims_in=dims[fine + 1], dims_out=dims[fine])


def _oplan(plans, i, train):
    """Banded one-hot plan for map ``i`` — eval-only (the Pallas kernel has
    no VJP; training keeps the gather-GEMM custom-VJP path)."""
    if train or not plans or i >= len(plans):
        return None
    return plans[i]


class MinkUNetBase(nn.Module):
    out_channels: int
    block: str = "basic"
    layers: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2)
    planes: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)
    init_dim: int = 32
    axis_name: Optional[str] = None
    # rematerialize residual blocks in the backward pass: the img2col conv
    # buffers are the dominant activation memory; without remat the train
    # step spills/compresses and runtime explodes
    remat: bool = True

    def _blocks(self, n, planes, feats, kmap, valid, train, name,
                dense_plan=None, plan=None, zmasks=None):
        blk = BLOCKS[self.block]
        if self.remat:
            blk = nn.remat(blk, static_argnums=(4,))
        for i in range(n):
            feats = blk(planes, axis_name=self.axis_name, name=f"{name}_{i}")(
                feats, kmap, valid, train, dense_plan, plan, zmasks
            )
        return feats

    @nn.compact
    def __call__(self, topo: UNetTopology, feats: jnp.ndarray, train: bool):
        ax = self.axis_name
        lv = topo.levels
        v = [l.valid for l in lv]
        exp = BLOCK_EXPANSION[self.block]
        didx, ddims = _dense_cells(topo)
        # per-level z-adjacency masks: same-level k3 convs gather their
        # center (dx,dy)=(0,0) group by row shifts (sparse_ops.zrun_masks)
        zm = [sparse_ops.zrun_masks(l.coords, l.valid, l.stride) for l in lv]

        # stem (conv0p1s1 k=5 + bn0 + relu), /root/reference/network/Mink.py:221-224,293-295
        out = _stem_conv(self.init_dim, topo, feats, v[0])
        out = MaskedBatchNorm(axis_name=ax, name="bn0")(out, v[0], train)
        out_p1 = relu(out)

        # encoder
        enc = []
        x = out_p1
        ch = self.init_dim
        for s in range(4):
            x = SparseConv(ch, 8, name=f"conv{s+1}s2")(
                x, topo.down_maps[s], v[s + 1], kmap_bwd=topo.up_maps[s],
                dense_plan=_pair_plan(didx, ddims, s, "down"),
                plan=_oplan(topo.down_plans, s, train))
            x = MaskedBatchNorm(axis_name=ax, name=f"bn{s+1}")(x, v[s + 1], train)
            x = relu(x)
            x = self._blocks(
                self.layers[s], self.planes[s], x, topo.k3_maps[s + 1], v[s + 1],
                train, f"block{s+1}",
                dense_plan=_same_plan(didx, ddims, s + 1),
                plan=_oplan(topo.k3_plans, s + 1, train),
                zmasks=zm[s + 1],
            )
            ch = self.planes[s] * exp
            enc.append(x)

        # decoder: levels 3, 2, 1, 0 with skips enc[2], enc[1], enc[0], out_p1
        skips = [enc[2], enc[1], enc[0], out_p1]
        for d in range(4):
            lvl = 3 - d  # target level index
            x = SparseConv(self.planes[4 + d], 8, name=f"convtr{4+d}")(
                x, topo.up_maps[lvl], v[lvl], kmap_bwd=topo.down_maps[lvl],
                dense_plan=_pair_plan(didx, ddims, lvl, "up"),
                plan=_oplan(topo.up_plans, lvl, train),
                single_present=True,
            )
            x = MaskedBatchNorm(axis_name=ax, name=f"bntr{4+d}")(x, v[lvl], train)
            x = relu(x)
            x = jnp.concatenate([x, skips[d]], axis=1)
            x = self._blocks(
                self.layers[4 + d], self.planes[4 + d], x, topo.k3_maps[lvl],
                v[lvl], train, f"block{5+d}",
                dense_plan=_same_plan(didx, ddims, lvl),
                plan=_oplan(topo.k3_plans, lvl, train),
                zmasks=zm[lvl],
            )

        # final 1x1 conv with bias (/root/reference/network/Mink.py:282-287)
        return SparseLinear(self.out_channels, use_bias=True, name="final")(x, v[0])


class MinkMiniUNet(nn.Module):
    """2-level UNet ('Mini_Unet', /root/reference/network/Mink.py:423-499)."""

    out_channels: int
    block: str = "basic"
    layers: Sequence[int] = (2, 2)
    planes: Sequence[int] = (32, 64)
    init_dim: int = 32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, topo: UNetTopology, feats: jnp.ndarray, train: bool):
        ax = self.axis_name
        lv = topo.levels
        v = [l.valid for l in lv]
        blk = BLOCKS[self.block]
        zm = [sparse_ops.zrun_masks(l.coords, l.valid, l.stride) for l in lv]

        out = _stem_conv(self.init_dim, topo, feats, v[0])
        out = MaskedBatchNorm(axis_name=ax, name="bn0")(out, v[0], train)
        out_p0 = relu(out)

        x = SparseConv(self.init_dim, 8, name="conv1s2")(
            out_p0, topo.down_maps[0], v[1], kmap_bwd=topo.up_maps[0],
            plan=_oplan(topo.down_plans, 0, train))
        x = MaskedBatchNorm(axis_name=ax, name="bn1")(x, v[1], train)
        x = relu(x)
        for i in range(self.layers[0]):
            x = blk(self.planes[0], axis_name=ax, name=f"block1_{i}")(
                x, topo.k3_maps[1], v[1], train,
                plan=_oplan(topo.k3_plans, 1, train), zmasks=zm[1]
            )

        x = SparseConv(self.planes[1], 8, name="convtr2")(
            x, topo.up_maps[0], v[0], kmap_bwd=topo.down_maps[0],
            plan=_oplan(topo.up_plans, 0, train), single_present=True)
        x = MaskedBatchNorm(axis_name=ax, name="bntr1")(x, v[0], train)
        x = relu(x)
        x = jnp.concatenate([x, out_p0], axis=1)
        for i in range(self.layers[1]):
            x = blk(self.planes[1], axis_name=ax, name=f"block2_{i}")(
                x, topo.k3_maps[0], v[0], train,
                plan=_oplan(topo.k3_plans, 0, train), zmasks=zm[0]
            )
        return SparseLinear(self.out_channels, use_bias=True, name="final")(x, v[0])


# Architecture registry mirroring Mink_unet(arch=...)
# (/root/reference/network/Mink.py:502-526)
ARCHS = {
    "MinkUNet14A": dict(layers=(1,) * 8, planes=(32, 64, 128, 256, 128, 128, 96, 96), block="basic"),
    "MinkUNet14B": dict(layers=(1,) * 8, planes=(32, 64, 128, 256, 128, 128, 128, 128), block="basic"),
    "MinkUNet14C": dict(layers=(1,) * 8, planes=(32, 64, 128, 256, 192, 192, 128, 128), block="basic"),
    "MinkUNet14D": dict(layers=(1,) * 8, planes=(32, 64, 128, 256, 384, 384, 384, 384), block="basic"),
    "MinkUNet18A": dict(layers=(2,) * 8, planes=(32, 64, 128, 256, 128, 128, 96, 96), block="basic"),
    "MinkUNet18B": dict(layers=(2,) * 8, planes=(32, 64, 128, 256, 128, 128, 128, 128), block="basic"),
    "MinkUNet18D": dict(layers=(2,) * 8, planes=(32, 64, 128, 256, 384, 384, 384, 384), block="basic"),
    "MinkUNet34A": dict(layers=(2, 3, 4, 6, 2, 2, 2, 2), planes=(32, 64, 128, 256, 256, 128, 64, 64), block="basic"),
    "MinkUNet34B": dict(layers=(2, 3, 4, 6, 2, 2, 2, 2), planes=(32, 64, 128, 256, 256, 128, 64, 32), block="basic"),
    "MinkUNet34C": dict(layers=(2, 3, 4, 6, 2, 2, 2, 2), planes=(32, 64, 128, 256, 256, 128, 96, 96), block="basic"),
    "MinkUNet50": dict(layers=(2, 3, 4, 6, 2, 2, 2, 2), planes=(32, 64, 128, 256, 256, 128, 96, 96), block="bottleneck"),
    "MinkUNet101": dict(layers=(2, 3, 4, 23, 2, 2, 2, 2), planes=(32, 64, 128, 256, 256, 128, 96, 96), block="bottleneck"),
}


def mink_unet(out_channels: int, arch: str = "MinkUNet18A", axis_name=None):
    """Factory matching the reference's Mink_unet()."""
    if arch == "Mini_Unet":
        return MinkMiniUNet(out_channels=out_channels, axis_name=axis_name)
    if arch not in ARCHS:
        raise ValueError(f"architecture {arch} not supported")
    cfg = ARCHS[arch]
    return MinkUNetBase(
        out_channels=out_channels, axis_name=axis_name, **cfg
    )
