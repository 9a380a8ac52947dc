"""Matrix NMS over proposal masks.

The reference computes the (P, P) cross-IoU with one mask matmul on GPU and
runs greedy NMS on host (/root/reference/eval_map.py:87-98,
/root/reference/tools/mIOU.py:77-87).  The matmul is MXU-friendly as-is; the
greedy pick loop is a small sequential reduction done with lax.while_loop so
the whole thing can stay on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cross_iou(masks: jnp.ndarray) -> jnp.ndarray:
    """(P, N) binary masks -> (P, P) IoU matrix (one MXU matmul)."""
    m = masks.astype(jnp.float32)
    inter = m @ m.T
    size = jnp.sum(m, axis=1)
    union = size[:, None] + size[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def greedy_nms(ious: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
               threshold: float) -> jnp.ndarray:
    """Greedy NMS, identical to tools/mIOU.py:77-87: repeatedly pick the
    highest-score remaining proposal, suppress those with IoU > threshold.

    Returns a (P,) bool keep mask (the reference returns pick indices in
    score order; a mask is equivalent downstream).
    """
    p = ious.shape[0]

    def cond(state):
        alive, _ = state
        return jnp.any(alive)

    def body(state):
        alive, keep = state
        s = jnp.where(alive, scores, -jnp.inf)
        i = jnp.argmax(s)
        keep = keep.at[i].set(True)
        suppress = (ious[i] > threshold) | (jnp.arange(p) == i)
        return alive & ~suppress, keep

    _, keep = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros((p,), bool))
    )
    return keep


def greedy_nms_np(ious: np.ndarray, scores: np.ndarray, threshold: float) -> np.ndarray:
    """Host oracle: literal port of the reference algorithm."""
    ixs = scores.argsort()[::-1]
    pick = []
    while len(ixs) > 0:
        i = ixs[0]
        pick.append(i)
        iou = ious[i, ixs[1:]]
        remove = np.where(iou > threshold)[0] + 1
        ixs = np.delete(ixs, remove)
        ixs = np.delete(ixs, 0)
    return np.array(pick, dtype=np.int32)
