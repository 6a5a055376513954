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


# ---- BEV metric supervision (BEVSupervisor, tracking_supervision.py:134-331)


def sample_bev_features(bev: jnp.ndarray, centers_xy: jnp.ndarray,
                        point_cloud_range, rng: Optional[jax.Array] = None,
                        jitter: float = 0.5) -> jnp.ndarray:
    """BEV features at (optionally jittered) object centers.

    The reference samples `interpolateBEV(pts_feats, gt_xy + randn/2)`
    (tracking_supervision.py:293-296); its interpolateBEV normalizes to
    [0, W] instead of grid_sample's [-1, 1] (a documented bug, see
    ops/bev_feat) — we sample with the corrected normalization.

    Args:
        bev: (H, W, C); centers_xy: (M, 2) lidar-frame.
    Returns:
        (M, C).
    """
    from ..ops.bev_feat import interpolate_bev
    if rng is not None and jitter > 0:
        centers_xy = centers_xy + jitter * jax.random.normal(
            rng, centers_xy.shape, centers_xy.dtype)
    return interpolate_bev(bev, centers_xy, point_cloud_range)


def bev_triplet_metric_loss(feats: jnp.ndarray, track_ids: jnp.ndarray,
                            num_tracks: int, margin: float = 1.0
                            ) -> jnp.ndarray:
    """Per-track triplet metric loss over scene-accumulated BEV features.

    Reference semantics (BEVSupervisor.get_metric_loss,
    tracking_supervision.py:183-270): group features by track id; for every
    anchor in a track, positives are the track's other samples and negatives
    are samples of OTHER tracks; one mean TripletMarginLoss per track,
    summed over tracks. Deviations, both documented: the reference
    subsamples `sample_num` negatives per other track (a GPU memory
    workaround — we evaluate the full masked triplet set, fixed shapes, no
    host loop), and keys its memory by batch index in __call__ but by class
    index in reset/get_metric_loss (only coherent when the two ranges
    coincide — callers here group per class explicitly).

    Args:
        feats: (M, C) features. track_ids: (M,) int in [-1, num_tracks);
            -1 marks padding. num_tracks: static dense id count.
        margin: TripletMarginLoss margin (torch default 1.0; d = L2 of
            (a - b + 1e-6), matching torch pairwise_distance eps).
    Returns:
        scalar loss = sum over tracks of that track's mean hinge.
    """
    m = feats.shape[0]
    valid = track_ids >= 0
    diff = feats[:, None, :] - feats[None, :, :] + 1e-6
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))              # (M, M)
    both = valid[:, None] & valid[None, :]
    same = (track_ids[:, None] == track_ids[None, :]) & both
    eye = jnp.eye(m, dtype=bool)
    pos_mask = same & ~eye
    neg_mask = (~same) & both
    hinge = jax.nn.relu(dist[:, :, None] - dist[:, None, :] + margin)
    tmask = (pos_mask[:, :, None] & neg_mask[:, None, :]).astype(feats.dtype)
    per_anchor_sum = jnp.sum(hinge * tmask, axis=(1, 2))        # (M,)
    per_anchor_cnt = jnp.sum(tmask, axis=(1, 2))
    ids = jnp.clip(track_ids, 0, num_tracks - 1)
    tl = jax.ops.segment_sum(per_anchor_sum, ids, num_segments=num_tracks)
    tc = jax.ops.segment_sum(per_anchor_cnt, ids, num_segments=num_tracks)
    return jnp.sum(tl / jnp.maximum(tc, 1.0))


class BEVMemory:
    """Host-side per-class scene memory for BEV metric supervision
    (BEVSupervisor.memory/reset, tracking_supervision.py:165-180): append
    (features, track ids) per frame, compute the metric loss at scene end."""

    def __init__(self):
        self._feats = {}
        self._ids = {}

    def reset(self):
        self._feats.clear()
        self._ids.clear()

    def append(self, cls_idx: int, feats, track_ids):
        self._feats.setdefault(cls_idx, []).append(feats)
        self._ids.setdefault(cls_idx, []).append(track_ids)

    def metric_loss(self, margin: float = 1.0) -> jnp.ndarray:
        """Sum of per-class per-track triplet losses over the scene."""
        import numpy as np
        total = jnp.zeros(())
        for cls_idx in self._feats:
            feats = jnp.concatenate([jnp.asarray(f)
                                     for f in self._feats[cls_idx]], axis=0)
            raw = np.concatenate([np.asarray(i) for i in self._ids[cls_idx]])
            uniq = np.unique(raw[raw >= 0])
            lookup = {int(v): i for i, v in enumerate(uniq)}
            dense = np.array([lookup.get(int(v), -1) for v in raw], np.int32)
            total = total + bev_triplet_metric_loss(
                feats, jnp.asarray(dense), num_tracks=max(len(uniq), 1),
                margin=margin)
        return total
