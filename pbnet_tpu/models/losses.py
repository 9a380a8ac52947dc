"""PBNet losses — parity with model_fn (/root/reference/network/PBNet.py:349-468).

* semantic: cross-entropy with ignore_index=-100 (:372-373)
* offset: L1 norm + cosine direction, masked to valid instance points (:376-390)
* mask: BCE with -1-ignore weighting (:396-402) + dice loss (:463-468)
* score: BCE against linearly-ramped max-IoU targets (:407-416,
  tools/mIOU.py:34-48)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import iou as iou_ops


def semantic_loss(logits, sem_label, valid):
    """CE with ignore_index=-100, mean over non-ignored (torch semantics)."""
    ok = valid & (sem_label != -100)
    lab = jnp.clip(sem_label, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, lab[:, None], axis=1)[:, 0]
    return jnp.sum(jnp.where(ok, nll, 0.0)) / jnp.maximum(
        jnp.sum(ok.astype(jnp.float32)), 1.0
    )


def offset_losses(offset_pred, xyz, instance_info, ins_label, valid):
    """L1-norm loss + cosine direction loss (/root/reference/network/
    PBNet.py:376-390).  instance_info[:, :3] is the instance mean."""
    gt_offsets = instance_info[:, 0:3] - xyz
    pt_dist = jnp.sum(jnp.abs(offset_pred - gt_offsets), axis=-1)
    vmask = (valid & (ins_label != -100)).astype(jnp.float32)
    denom = jnp.sum(vmask) + 1e-6
    norm_loss = jnp.sum(pt_dist * vmask) / denom

    gt_norm = jnp.linalg.norm(gt_offsets, axis=1)
    gt_unit = gt_offsets / (gt_norm[:, None] + 1e-8)
    pred_norm = jnp.linalg.norm(offset_pred, axis=1)
    pred_unit = offset_pred / (pred_norm[:, None] + 1e-8)
    direction_diff = -jnp.sum(gt_unit * pred_unit, axis=-1)
    dir_loss = jnp.sum(direction_diff * vmask) / denom
    return norm_loss, dir_loss


def mask_losses(pred_mask, gt_mask, valid):
    """BCE with -1 ignored via zero weights + dice over non-ignored
    (:396-405).  gt_mask: 1/0/-1."""
    w = (valid & (gt_mask != -1.0)).astype(jnp.float32)
    gt = jnp.where(gt_mask == -1.0, 0.5, gt_mask)  # "any value is ok" (:398)
    p = jnp.clip(pred_mask, 1e-7, 1 - 1e-7)
    bce = -(gt * jnp.log(p) + (1 - gt) * jnp.log(1 - p)) * w
    # reference takes .mean() over ALL elements after weighting (:401)
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    mask_loss = jnp.sum(bce) / denom

    mp = pred_mask * w
    mg = gt_mask * w
    inter = 2.0 * jnp.sum(mg * mp) + 1.0
    union = jnp.sum(mg * mg) + jnp.sum(mp * mp) + 1.0 + 1e-8
    dice = 1.0 - inter / union
    return mask_loss, dice


def get_segmented_scores(scores, fg_thresh=1.0, bg_thresh=0.0):
    """Linear fg/bg ramp (/root/reference/tools/mIOU.py:34-48)."""
    fg = scores > fg_thresh
    bg = scores < bg_thresh
    k = 1.0 / (fg_thresh - bg_thresh)
    b = bg_thresh / (bg_thresh - fg_thresh)
    mid = scores * k + b
    return jnp.where(fg, 1.0, jnp.where(bg, 0.0, mid))


def score_loss(
    clt_scores, prop_valid, point_pid, point_ins, point_kept,
    instance_pointnum, fg_thresh, bg_thresh, proposal_cap, instance_cap,
):
    """BCE between predicted proposal scores and ramped max-IoU (:407-416)."""
    ious = iou_ops.proposal_instance_iou(
        point_pid, point_ins, point_kept, instance_pointnum,
        proposal_cap, instance_cap,
    )
    gt_ious = jnp.max(ious, axis=1)
    gt_scores = get_segmented_scores(gt_ious, fg_thresh, bg_thresh)
    p = jnp.clip(clt_scores, 1e-7, 1 - 1e-7)
    bce = -(gt_scores * jnp.log(p) + (1 - gt_scores) * jnp.log(1 - p))
    vm = prop_valid.astype(jnp.float32)
    return jnp.sum(bce * vm) / jnp.maximum(jnp.sum(vm), 1.0)


def model_fn(ret, batch, cfg_like, with_instances: bool):
    """Total loss + metric dict, mirroring model_fn's composition (:366-444)."""
    sem_l = semantic_loss(
        ret["sem_pred_score_p"], batch["sem_label"], ret["point_ok"]
    )
    norm_l, dir_l = offset_losses(
        ret["offset_pred_p"], batch["xyz"], batch["inst_info"],
        batch["ins_label"], ret["point_ok"],
    )
    loss = sem_l + norm_l + dir_l
    aux = {
        "semantic_loss": sem_l,
        "offset_norm_loss": norm_l,
        "offset_dir_loss": dir_l,
    }
    # capacity-overrun diagnostics: visible in scalars.jsonl, asserted zero in
    # the e2e tests (the model promises no silent work-dropping)
    for k in ("overflow_vox", "overflow_grid", "overflow_band"):
        if k in ret:
            aux[k] = ret[k].astype(jnp.float32)
    if with_instances and "overflow" in ret:
        for k, v in ret["overflow"].items():
            aux[f"overflow_{k}"] = v.astype(jnp.float32)
    if with_instances:
        mask_l, dice_l = mask_losses(
            ret["mask_scores"], ret["gt_mask"], ret["scene_valid"]
        )
        sc_l = score_loss(
            ret["clt_scores"], ret["prop_valid"],
            ret["prop_point_pid"], batch["ins_label"][ret["prop_point_src"]],
            ret["prop_point_kept"], batch["instance_pointnum"],
            cfg_like.fg_thresh, cfg_like.bg_thresh,
            ret["clt_scores"].shape[0], batch["instance_pointnum"].shape[0],
        )
        loss = loss + mask_l + dice_l + sc_l
        aux.update({"mask_loss": mask_l, "dice_loss": dice_l, "score_loss": sc_l})
    aux["loss"] = loss
    return loss, aux
