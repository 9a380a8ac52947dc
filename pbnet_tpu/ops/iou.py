"""Proposal-instance IoU ops (PB_lib get_iou / cal_iou_and_masklabel).

The reference computes an (nProposal, nInstance) IoU matrix by scanning each
proposal's point list against the instance labels on GPU
(/root/reference/lib/PB_lib/src/iou/get_iou.cu:12-38, wrapper
pbnet_ops.py:85-111).  TPU-native: intersections are one segment-sum over the
flat proposal-point list keyed by ``proposal_id * I + instance_label`` —
a single scatter-add instead of per-thread scans.

Proposals here are static-shape: a flat point list with per-point proposal id
and validity (the CSR (proposals_idx, proposals_offset) of the reference,
padded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("proposal_cap", "instance_cap"))
def proposal_instance_iou(
    point_proposal: jnp.ndarray,  # (T,) int32 proposal id per proposal-point
    point_instance: jnp.ndarray,  # (T,) int32 instance label of that point (-100 = none)
    point_valid: jnp.ndarray,  # (T,) bool
    instance_pointnum: jnp.ndarray,  # (I_cap,) int32 GT instance sizes
    proposal_cap: int,
    instance_cap: int,
) -> jnp.ndarray:
    """IoU matrix (P_cap, I_cap): inter / (prop_size + inst_size - inter)."""
    p = point_proposal
    i = point_instance
    ok = point_valid & (p >= 0) & (p < proposal_cap)
    okk = ok & (i >= 0) & (i < instance_cap)
    flat = jnp.where(okk, p * instance_cap + i, proposal_cap * instance_cap)
    inter = jax.ops.segment_sum(
        okk.astype(jnp.float32), flat,
        num_segments=proposal_cap * instance_cap + 1,
    )[:-1].reshape(proposal_cap, instance_cap)
    prop_size = jax.ops.segment_sum(
        ok.astype(jnp.float32),
        jnp.where(ok, p, proposal_cap),
        num_segments=proposal_cap + 1,
    )[:-1]
    union = prop_size[:, None] + instance_pointnum[None, :].astype(jnp.float32) - inter
    return inter / jnp.maximum(union, 1e-12)


@functools.partial(jax.jit, static_argnames=("proposal_cap", "instance_cap", "mode"))
def iou_and_mask_label(
    point_proposal: jnp.ndarray,
    point_instance: jnp.ndarray,
    point_valid: jnp.ndarray,
    mask_scores: jnp.ndarray,  # (T,) sigmoid mask score per proposal-point
    instance_pointnum: jnp.ndarray,
    proposal_cap: int,
    instance_cap: int,
    mode: int = 0,
):
    """Capability-parity port of cal_iou_and_masklabel
    (/root/reference/lib/PB_lib/src/cal_iou_and_masklabel/
    cal_iou_and_masklabel.cu:16-91): IoU either on raw membership (mode 0) or
    mask>0.5-thresholded membership (mode 1); per-proposal max-IoU GT defines
    1/0 mask labels when IoU > 0.5, else -1."""
    member = point_valid if mode == 0 else (point_valid & (mask_scores > 0.5))
    ious = proposal_instance_iou(
        point_proposal, point_instance, member,
        instance_pointnum, proposal_cap, instance_cap,
    )
    best_iou = jnp.max(ious, axis=1)
    best_inst = jnp.argmax(ious, axis=1).astype(jnp.int32)
    use = best_iou > 0.5  # (P,)
    p_ok = (point_proposal >= 0) & (point_proposal < proposal_cap) & point_valid
    pid = jnp.clip(point_proposal, 0, proposal_cap - 1)
    lbl = jnp.where(
        p_ok & use[pid],
        (point_instance == best_inst[pid]).astype(jnp.float32),
        -1.0,
    )
    return ious, lbl
