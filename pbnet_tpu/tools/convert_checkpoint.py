"""Convert reference PBNet torch checkpoints to pbnet_tpu flax variables.

The reference saves ``{'model': state_dict, 'optimizer': ...}`` (tools/
log.py:104-116) with MinkowskiEngine module naming
(/root/reference/network/PBNet.py:38-82, network/Mink.py:218-288):

reference name                          pbnet_tpu param path
--------------------------------------  --------------------------------------
MEUnet.conv0p1s1.kernel (125,Ci,Co)     MEUnet/conv0/kernel
MEUnet.bn0.bn.{weight,bias}             MEUnet/bn0/{scale,bias}
MEUnet.bn0.bn.running_{mean,var}        batch_stats: MEUnet/bn0/{mean,var}
MEUnet.conv{n}p*s2.kernel (8,Ci,Co)     MEUnet/conv{n}s2/kernel
MEUnet.block{n}.{i}.conv1.kernel        MEUnet/block{n}_{i}/conv1/kernel
MEUnet.block{n}.{i}.downsample.0.kernel MEUnet/block{n}_{i}/downsample_conv/
                                          Dense_0 kernel (1x1 conv == linear)
MEUnet.convtr{n}p*s2.kernel (8,Ci,Co)   MEUnet/convtr{n}/kernel
MEUnet.final_sematic.kernel (Ci,Co)     MEUnet/final/Dense_0/kernel
linear_sem.0.linear.weight (Co,Ci)      linear_sem/linear1/Dense_0/kernel^T
linear_sem.1.bn.*                       linear_sem/norm/*
linear_sem.2.weight (PReLU alpha)       linear_sem/prelu/alpha
linear_sem.3.linear.{weight,bias}       linear_sem/linear2/Dense_0/*

Kernel offset enumeration: this engine enumerates hypercube offsets x-major
(dx slowest, dz fastest; core/topology.kernel_offsets).  MinkowskiEngine
generates them x-FASTEST.  ``me_offset_permutation`` converts; set
``me_order='x_fastest'`` (default) for real ME checkpoints or ``'z_fastest'``
for identity (used by round-trip tests).
"""

from __future__ import annotations

import re

import numpy as np

from ..core.topology import kernel_offsets

UNETS = ("MEUnet", "D_Unet", "score_Unet")
HEADS = ("linear_sem", "linear_offset", "linear_binary", "linear_IOU_feat",
         "linear_IOU")

# reference strided/transpose conv names -> ours
_CONV_RENAME = {
    "conv0p1s1": "conv0",
    "conv1p1s2": "conv1s2",
    "conv2p2s2": "conv2s2",
    "conv3p4s2": "conv3s2",
    "conv4p8s2": "conv4s2",
    "convtr4p16s2": "convtr4",
    "convtr5p8s2": "convtr5",
    "convtr6p4s2": "convtr6",
    "convtr7p2s2": "convtr7",
    "final_sematic": "final",
    # Mini UNet (network/Mink.py:439-469)
    "convtr2p1s2": "convtr2",
    "final_score": "final",
}
_BN_RENAME = {
    "bn0": "bn0", "bn1": "bn1", "bn2": "bn2", "bn3": "bn3", "bn4": "bn4",
    "bntr4": "bntr4", "bntr5": "bntr5", "bntr6": "bntr6", "bntr7": "bntr7",
    "bntr1": "bntr1",
}


def me_offset_permutation(k: int, me_order: str = "x_fastest") -> np.ndarray:
    """perm such that ours_kernel[i] = me_kernel[perm[i]]."""
    ours = [tuple(o) for o in kernel_offsets(k)]
    if me_order == "z_fastest":
        me = ours
    elif me_order == "x_fastest":
        r = range(-(k // 2), k // 2 + 1) if k % 2 == 1 else range(0, k)
        me = [(dx, dy, dz) for dz in r for dy in r for dx in r]
    else:
        raise ValueError(me_order)
    index = {o: i for i, o in enumerate(me)}
    return np.array([index[o] for o in ours], np.int64)


def _conv_kernel(w: np.ndarray, me_order: str) -> np.ndarray:
    """(K^3, Ci, Co) ME kernel -> ours, permuting the offset axis."""
    kv = w.shape[0]
    k = round(kv ** (1 / 3))
    assert k ** 3 == kv, w.shape
    return w[me_offset_permutation(k, me_order)]


def convert_state_dict(state_dict: dict, me_order: str = "x_fastest"):
    """torch state_dict (numpy-convertible values) -> (params, batch_stats)."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    for name, val in state_dict.items():
        name = re.sub(r"^module\.", "", name)
        v = np.asarray(val)
        parts = name.split(".")
        top = parts[0]

        if top in UNETS:
            sub = parts[1]
            if sub in _CONV_RENAME:
                ours = _CONV_RENAME[sub]
                if parts[-1] == "kernel":
                    if v.ndim == 3:
                        put(params, (top, ours, "kernel"), _conv_kernel(v, me_order))
                    else:  # 1x1 conv stored 2D == our Dense final head
                        put(params, (top, ours, "Dense_0", "kernel"), v)
                elif parts[-1] == "bias":
                    put(params, (top, ours, "Dense_0", "bias"), v)
            elif sub in _BN_RENAME:
                _bn(params, stats, (top, _BN_RENAME[sub]), parts, v)
            elif sub.startswith("block"):
                blk = f"{sub}_{parts[2]}"
                inner = parts[3]
                if inner in ("conv1", "conv2"):
                    if parts[-1] == "kernel":
                        put(params, (top, blk, inner, "kernel"),
                            _conv_kernel(v, me_order))
                elif inner in ("norm1", "norm2"):
                    _bn(params, stats, (top, blk, inner), parts, v)
                elif inner == "downsample":
                    if parts[4] == "0":  # 1x1 conv
                        if parts[-1] == "kernel":
                            put(params, (top, blk, "downsample_conv", "Dense_0",
                                         "kernel"), v)
                    else:  # BN
                        _bn(params, stats, (top, blk, "downsample_norm"), parts, v)
        elif top in HEADS:
            idx = parts[1]
            leaf = parts[-1]
            if idx == "0" and parts[2] == "linear":
                put(params, (top, "linear1", "Dense_0", "kernel"), v.T)
            elif idx == "1":
                _bn(params, stats, (top, "norm"), parts, v)
            elif idx == "2" and leaf == "weight":  # PReLU
                put(params, (top, "prelu", "alpha"), v.reshape(-1)[:1])
            elif idx == "3" and parts[2] == "linear":
                if leaf == "weight":
                    put(params, (top, "linear2", "Dense_0", "kernel"), v.T)
                else:
                    put(params, (top, "linear2", "Dense_0", "bias"), v)
    return params, stats


def _bn(params, stats, path, parts, v):
    leaf = parts[-1]
    def put(tree, p, value):
        node = tree
        for q in p[:-1]:
            node = node.setdefault(q, {})
        node[p[-1]] = np.asarray(value)
    if leaf == "weight":
        put(params, path + ("scale",), v)
    elif leaf == "bias":
        put(params, path + ("bias",), v)
    elif leaf == "running_mean":
        put(stats, path + ("mean",), v)
    elif leaf == "running_var":
        put(stats, path + ("var",), v)
    # num_batches_tracked: dropped


def load_reference_checkpoint(path: str, me_order: str = "x_fastest"):
    """Load a reference .pth and return (params, batch_stats) numpy trees."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload["model"] if isinstance(payload, dict) and "model" in payload else payload
    sd = {k: t.detach().cpu().numpy() for k, t in sd.items()
          if hasattr(t, "detach")}
    return convert_state_dict(sd, me_order)


def merge_into_variables(variables, params, stats):
    """Overlay converted arrays onto an initialized variables tree (shape- and
    dtype-checked); returns the merged tree and a list of unmatched paths."""
    import jax

    unmatched = []

    def overlay(dst, src, prefix):
        for k, v in src.items():
            if isinstance(v, dict):
                if k in dst:
                    overlay(dst[k], v, prefix + (k,))
                else:
                    unmatched.append("/".join(prefix + (k,)))
            else:
                if k in dst and tuple(np.shape(dst[k])) == tuple(v.shape):
                    dst[k] = jax.numpy.asarray(v, dtype=np.float32)
                else:
                    unmatched.append("/".join(prefix + (k,)))

    import copy

    merged = copy.deepcopy(jax.device_get(variables))
    overlay(merged["params"], params, ("params",))
    overlay(merged["batch_stats"], stats, ("batch_stats",))
    return merged, unmatched
