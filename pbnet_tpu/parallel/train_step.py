"""Data-parallel train/eval steps: shard_map over the data mesh.

Replaces the reference's DDP backward allreduce + SyncBatchNorm
(/root/reference/train.py:343-345) with explicit XLA collectives:
* gradients: ``pmean`` over the data axis (rides ICI)
* BatchNorm statistics: ``psum`` inside MaskedBatchNorm (axis_name='data')

The optimizer is Adam (reference default, /root/reference/train.py:350-351)
with the reference's cosine-after-warmup schedule applied per epoch
(cosine_lr_after_step, /root/reference/train.py:27-33); the learning rate is
fed as a step argument so one compiled step serves all epochs.
"""

from __future__ import annotations

import functools
import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..models import losses as L
from .mesh import DATA_AXIS

# reference module-freezing name map (/root/reference/network/PBNet.py:94-97)
FIX_MODULE_MAP = {
    "Unet_backbone": "MEUnet",
    "linear_sem": "linear_sem",
    "linear_off": "linear_offset",
    "D_Unet": "D_Unet",
}


def freeze_grads(grads, fix_modules):
    """Zero gradients of frozen top-level modules (requires_grad=False
    equivalent, /root/reference/network/PBNet.py:98-101)."""
    frozen = {FIX_MODULE_MAP.get(m, m) for m in fix_modules}
    if not frozen:
        return grads
    return {
        k: (jax.tree_util.tree_map(jnp.zeros_like, v) if k in frozen else v)
        for k, v in grads.items()
    }


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any


def cosine_lr_after_step(base_lr, epoch, step_epoch, total_epochs, clip=1e-6):
    """Constant until step_epoch, then half-cosine decay to clip
    (/root/reference/train.py:27-33).  Epochs count from 1."""
    if epoch < step_epoch:
        return base_lr
    return clip + 0.5 * (base_lr - clip) * (
        1 + math.cos(math.pi * ((epoch - step_epoch) / (total_epochs - step_epoch)))
    )


def make_optimizer(cfg):
    if cfg.optimizer == "Adam":
        return optax.scale_by_adam()
    if cfg.optimizer == "AdamW":
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.99),
            optax.add_decayed_weights(cfg.weight_decay),
        )
    if cfg.optimizer == "SGD":
        return optax.chain(
            optax.trace(decay=cfg.momentum),
            optax.add_decayed_weights(cfg.weight_decay),
        )
    raise ValueError(cfg.optimizer)


def make_train_step(model, cfg, mesh, tx, with_instances: bool):
    """Returns a jitted step: (state, device_batch_stack, lr) -> (state, aux).

    device_batch_stack arrays have a leading device axis sharded over 'data'.
    """

    class CfgLike:
        fg_thresh = cfg.fg_thresh
        bg_thresh = cfg.bg_thresh

    def per_device(params, batch_stats, batch):
        # shards keep a leading device axis of size 1 -> squeeze it
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)

        def loss_fn(p):
            ret, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch, with_instances=with_instances, with_labels=True,
                train=True, mutable=["batch_stats"],
            )
            loss, aux = L.model_fn(ret, batch, CfgLike, with_instances)
            return loss, (aux, updates["batch_stats"])

        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        aux = jax.lax.pmean(aux, DATA_AXIS)
        # SyncBN stats are already identical across devices (psum inside BN
        # when axis_name is set); pmean is a no-op safety net otherwise.
        new_stats = jax.lax.pmean(new_stats, DATA_AXIS)
        return grads, new_stats, aux

    # The optimizer stays OUTSIDE shard_map: threading the ~600-leaf
    # param/opt trees through a manual region cost ~14s/step in copies;
    # computed here the Adam update is a millisecond of elementwise work.
    mapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS)),
        out_specs=(P(), P(), P()),
        # scan carries inside the clustering op start as replicated constants
        # and become device-varying; skip the vma analysis
        check_vma=False,
    )

    @jax.jit
    def step(state: TrainState, batch_stack, lr):
        grads, new_stats, aux = mapped(state.params, state.batch_stats, batch_stack)
        grads = freeze_grads(grads, cfg.fix_module)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(
            lambda u: -jnp.float32(lr) * u, updates
        )
        new_params = optax.apply_updates(state.params, updates)
        # observability + a scheduling anchor: on this backend, fetching only
        # the loss scalar degrades async execution ~18x; fetching a value that
        # depends on the UPDATED params keeps the pipeline properly scheduled
        aux = dict(aux)
        aux["grad_norm"] = optax.global_norm(grads)
        aux["param_norm"] = optax.global_norm(new_params)
        return TrainState(new_params, new_stats, new_opt), aux

    return step


def make_eval_step(model, mesh, with_instances: bool, with_labels: bool = False):
    """Jitted eval forward over the mesh: each device runs one scene batch
    (the reference shards val scenes across GPUs via DistributedSampler,
    /root/reference/datasets/scannetv2/dataset_preprocess.py:59); outputs come
    back stacked along the device axis for per-scene host post-processing."""

    def per_device(params, batch_stats, batch):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        ret = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, with_instances=with_instances, with_labels=with_labels,
            train=False,
        )
        return jax.tree_util.tree_map(lambda x: x[None], ret)

    mapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(mapped)
