"""Tracking supervision losses, pure jax.

Equivalent of the reference supervision suite
(trackers/deprecated/tracking_supervision.py: focal loss :25-60,
MarginAssociationSupervisor / BEVSupervisor margin + softmax cost-matrix
objectives :61-420): losses over a (T, D) association cost/logit matrix given
the ground-truth matching.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       alpha: float = 0.25, gamma: float = 2.0,
                       weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sigmoid focal loss (tracking_supervision.py:25-60), mean-reduced."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        a_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = a_t * loss
    if weight is not None:
        loss = loss * weight
    return jnp.mean(loss)


def optax_sigmoid_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable sigmoid BCE (log-sum-exp form)."""
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def association_margin_loss(cost: jnp.ndarray, gt_matches: jnp.ndarray,
                            margin: float = 0.2,
                            valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Margin ranking over cost-matrix rows (MarginAssociationSupervisor).

    For every track t with ground-truth detection g(t), every other admissible
    detection must cost at least `margin` more:
        loss = mean relu(cost[t, g(t)] + margin - cost[t, d]),  d != g(t).

    Args:
        cost: (T, D) association costs (lower = better).
        gt_matches: (T,) int det index per track, -1 when the track has no
            ground-truth match this frame.
        valid: optional (T, D) mask of admissible pairs.
    """
    T, D = cost.shape
    has_gt = gt_matches >= 0
    gt_idx = jnp.clip(gt_matches, 0, D - 1)
    gt_cost = jnp.take_along_axis(cost, gt_idx[:, None], axis=1)     # (T, 1)
    viol = jax.nn.relu(gt_cost + margin - cost)                       # (T, D)
    not_gt = jax.lax.broadcasted_iota(jnp.int32, (T, D), 1) != gt_idx[:, None]
    mask = not_gt & has_gt[:, None]
    if valid is not None:
        mask = mask & valid
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, viol, 0.0)) / denom


def softmax_association_loss(logits: jnp.ndarray, gt_matches: jnp.ndarray,
                             valid: Optional[jnp.ndarray] = None
                             ) -> jnp.ndarray:
    """Row-softmax cross-entropy with an explicit 'no match' bucket
    (tracking_association.get_cost_mat_softmax semantics): each track chooses
    among D detections + 1 none-class; unmatched tracks supervise the none
    bucket.

    Args:
        logits: (T, D) match logits (higher = better).
        gt_matches: (T,) det index or -1 for none.
    """
    T, D = logits.shape
    none_logit = jnp.zeros((T, 1), logits.dtype)
    full = jnp.concatenate([logits, none_logit], axis=1)             # (T, D+1)
    if valid is not None:
        full = jnp.where(
            jnp.concatenate([valid, jnp.ones((T, 1), bool)], axis=1),
            full, -jnp.inf)
    labels = jnp.where(gt_matches >= 0, gt_matches, D)
    logp = jax.nn.log_softmax(full, axis=1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
