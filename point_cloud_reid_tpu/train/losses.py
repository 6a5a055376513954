"""Loss zoo for the ReID task — pure functions of ReIDNet forward outputs.

Behavioral rebuild of the loss arithmetic embedded in the reference model
(mmdet3d/models/ReIDNet.py: match_forward:387-440, cls_forward:348-366,
fp_forward:368-385, shape_forward:508-523, get_kl_loss:467-484,
get_dense_loss:486-506, get_triplet_loss:538-582), re-expressed as fixed-shape
masked reductions so everything jits. Dynamic-shape gathers in the reference
(torch.where filters) become weighted means over validity masks — identical values,
compile-once shapes.

All functions take f32 inputs and return scalar f32 losses. Reference quirks that
are bugs (ReIDNetCosine's missing bce target, the dense-loss fp_filter reshape
mismatch) are fixed and documented in-place.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.geometry import square_distance


# ---- primitives -------------------------------------------------------------


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                    weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean binary cross-entropy on raw logits (torch BCEWithLogitsLoss)."""
    # log-sum-exp stable form: max(x,0) - x*t + log(1+exp(-|x|))
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return _masked_mean(loss, weights)


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray,
               weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean cross-entropy with integer labels (torch CrossEntropyLoss)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    return _masked_mean(nll, weights)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0,
              weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Huber / SmoothL1 (torch SmoothL1Loss, beta=1)."""
    d = jnp.abs(pred - target)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    if weights is not None:
        # per-row weights over flattened feature rows
        loss = jnp.mean(loss.reshape(loss.shape[0], -1), axis=-1)
    return _masked_mean(loss, weights)


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


# ---- task losses -------------------------------------------------------------


def kl_pair_loss(h1: jnp.ndarray, h2: jnp.ndarray, match: jnp.ndarray
                 ) -> jnp.ndarray:
    """Symmetrised per-pair KL objective (ReIDNet.py:467-484).

    KL(logsoftmax(h2_flat) || logsoftmax(h1_flat)) per pair, sign-flipped for
    negatives, then mean-over-negatives + mean-over-positives.
    """
    f1 = jax.nn.log_softmax(h1.reshape(h1.shape[0], -1), axis=1)
    f2 = jax.nn.log_softmax(h2.reshape(h2.shape[0], -1), axis=1)
    # torch kl_div(input=f1, target=f2, log_target=True) = exp(f2) * (f2 - f1)
    kl = jnp.mean(jnp.exp(f2) * (f2 - f1), axis=1)                  # (B,)
    signed = jnp.where(match == 0, -kl, kl)
    return _masked_mean(signed, match == 0) + _masked_mean(signed, match == 1)


def chamfer_per_sample(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Squared symmetric chamfer per batch element: (B, N, 3), (B, M, 3) -> (B,).

    Matches pytorch3d chamfer_distance semantics (sum of both directions' means)
    used by the reference shape loss (ReIDNet.py:27,517)."""
    d = square_distance(pred, target)
    return jnp.mean(jnp.min(d, axis=-1), axis=-1) + jnp.mean(jnp.min(d, axis=-2),
                                                             axis=-1)


def shape_loss(shape_points: jnp.ndarray, dense_cat: jnp.ndarray,
               valid: jnp.ndarray) -> jnp.ndarray:
    """Chamfer reconstruction loss over true-positive objects only
    (ReIDNet.py:508-523; valid = id != -1 filter from forward_train:604)."""
    return _masked_mean(chamfer_per_sample(shape_points, dense_cat), valid)


def triplet_loss(rng: jax.Array, h1: jnp.ndarray, h2: jnp.ndarray,
                 id1: jnp.ndarray, id2: jnp.ndarray, match: jnp.ndarray,
                 sample_num: int = 5, margin: float = 0.2) -> jnp.ndarray:
    """Triplet margin loss with per-pair negative mining (ReIDNet.py:538-582).

    For every positive pair (match==1): anchor = h1[i], positive = h2[i], and
    `sample_num` negatives drawn from the 2B embeddings whose id differs. The
    reference's torch.multinomial draw is without replacement for large pools;
    we sample with replacement via categorical — same distribution in expectation,
    fixed shapes for jit.
    """
    B = h1.shape[0]
    a = h1.reshape(B, -1)
    p = h2.reshape(B, -1)
    all_h = jnp.concatenate([a, p], axis=0)                         # (2B, D)
    id_cat = jnp.concatenate([id1, id2], axis=0)                    # (2B,)

    valid_neg = id_cat[None, :] != id1[:, None]                     # (B, 2B)
    logits = jnp.where(valid_neg, 0.0, -jnp.inf)
    neg_idx = jax.random.categorical(rng, logits[:, None, :],
                                     axis=-1,
                                     shape=(B, sample_num))          # (B, K)
    n = all_h[neg_idx.reshape(-1)].reshape(B, sample_num, -1)        # (B, K, D)

    d_ap = jnp.linalg.norm(a - p, axis=-1)                           # (B,)
    d_an = jnp.linalg.norm(a[:, None, :] - n, axis=-1)               # (B, K)
    per = jnp.maximum(d_ap[:, None] - d_an + margin, 0.0)            # (B, K)
    w = jnp.broadcast_to(match[:, None], per.shape)
    return _masked_mean(per, w)


def dense_distill_loss(h_cat: jnp.ndarray, dense_feats: jnp.ndarray,
                       ids_cat: jnp.ndarray) -> jnp.ndarray:
    """Distill sparse-crop features toward (stop-gradient) dense-crop features
    (ReIDNet.py:486-506). The reference's fp_filter indexing bug (filtered gather
    reshaped with the unfiltered size) is fixed as a masked mean over id != -1."""
    valid = (ids_cat != -1)
    return smooth_l1(h_cat.reshape(h_cat.shape[0], -1),
                     jax.lax.stop_gradient(dense_feats.reshape(
                         dense_feats.shape[0], -1)),
                     weights=valid)


# ---- aggregate ---------------------------------------------------------------


def match_metrics(logits: jnp.ndarray, match: jnp.ndarray,
                  prefix: str = "") -> Dict[str, jnp.ndarray]:
    """The reference's per-iter match summary (ReIDNet.py:425-435)."""
    preds = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
    return {
        prefix + "match_acc": jnp.mean((preds == match).astype(jnp.float32)),
        prefix + "num_gt_1": jnp.sum(match),
        prefix + "num_gt_0": jnp.sum(1.0 - match),
        prefix + "num_preds_1": jnp.sum(preds),
        prefix + "num_preds_0": jnp.sum(1.0 - preds),
    }


def reid_losses(outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray],
                losses_to_use: Dict[str, bool], alpha: Dict[str, float],
                rng: Optional[jax.Array] = None,
                dense_feats: Optional[jnp.ndarray] = None,
                fp_label_threshold: int = 9,
                triplet_sample_num: int = 5, triplet_margin: float = 0.2,
                use_o: bool = False, pool_type: str = "both",
                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted multi-task ReID loss (reference forward_train, ReIDNet.py:586-634).

    Which losses run is STATIC config (losses_to_use), so disabled heads compile
    away entirely. Returns (total_loss, log_vars).
    """
    from ..models.layers import pooled_feats  # local import to avoid cycle

    use = dict(kl=False, match=True, cls=False, shape=False, fp=False,
               dense=False, triplet=False)
    use.update(losses_to_use)
    a = dict(kl=1.0, match=1.0, cls=1.0, shape=1.0, fp=1.0, triplet=1.0,
             dense=1.0)
    a.update(alpha)

    log: Dict[str, jnp.ndarray] = {}
    total = jnp.asarray(0.0, jnp.float32)
    match = outputs["match"]
    labels_cat = None
    if "label_1" in batch:
        labels_cat = jnp.concatenate([batch["label_1"], batch["label_2"]], axis=0)
    ids_cat = None
    if "id_1" in batch:
        ids_cat = jnp.concatenate([batch["id_1"], batch["id_2"]], axis=0)

    if use["match"]:
        mloss = a["match"] * bce_with_logits(outputs["match_logits"], match)
        log["match_loss"] = mloss
        log.update(match_metrics(outputs["match_logits"], match))
        total = total + mloss

    if use["cls"]:
        closs = a["cls"] * softmax_ce(outputs["cls_logits"], labels_cat)
        log["cls_loss"] = closs
        log["cls_acc"] = jnp.mean(
            (jnp.argmax(outputs["cls_logits"], -1) == labels_cat).astype(
                jnp.float32))
        total = total + closs

    if use["fp"]:
        fp_target = (labels_cat > fp_label_threshold).astype(jnp.float32)
        fploss = a["fp"] * bce_with_logits(outputs["fp_logits"], fp_target)
        log["fp_loss"] = fploss
        log["fp_acc"] = jnp.mean(
            ((jax.nn.sigmoid(outputs["fp_logits"]) > 0.5).astype(jnp.float32)
             == fp_target).astype(jnp.float32))
        total = total + fploss

    if use["shape"]:
        dense_cat = jnp.concatenate([batch["dense_1"], batch["dense_2"]], axis=0)
        sloss = a["shape"] * shape_loss(outputs["shape_points"], dense_cat,
                                        valid=(ids_cat != -1))
        log["shape_loss"] = sloss
        total = total + sloss

    if use["kl"]:
        kloss = a["kl"] * kl_pair_loss(outputs["h1"], outputs["h2"], match)
        log["kl_loss"] = kloss
        total = total + kloss

    if use["dense"]:
        dloss = a["dense"] * dense_distill_loss(
            jnp.concatenate([outputs["h1"], outputs["h2"]], axis=0),
            dense_feats, ids_cat)
        log["dense_loss"] = dloss
        total = total + dloss

    if use.get("vis") and "vis_logits" in outputs:
        # visibility-class head, image branch only (vis_forward,
        # ReIDNet.py:972-991): CE over vis in {0..3}, rows with id == -1 or
        # vis == -1 excluded
        vis_cat = jnp.concatenate([batch["vis_1"], batch["vis_2"]], axis=0)
        valid = jnp.logical_and(ids_cat != -1, vis_cat != -1)
        vloss = a.get("vis", 1.0) * softmax_ce(
            outputs["vis_logits"], jnp.maximum(vis_cat, 0), weights=valid)
        log["vis_loss"] = vloss
        log["vis_acc"] = _masked_mean(
            (jnp.argmax(outputs["vis_logits"], -1) == vis_cat).astype(
                jnp.float32), valid)
        total = total + vloss

    if use["triplet"]:
        if use_o and "o1" in outputs:
            t1 = pooled_feats(outputs["o1"], pool_type)
            t2 = pooled_feats(outputs["o2"], pool_type)
        elif "h1d" in outputs:
            # image branch anchors triplets on the downsampled tokens
            # (ReIDNet.py:1241)
            t1, t2 = outputs["h1d"], outputs["h2d"]
        else:
            t1, t2 = outputs["h1"], outputs["h2"]
        tloss = a["triplet"] * triplet_loss(
            rng, t1, t2, batch["id_1"], batch["id_2"], match,
            sample_num=triplet_sample_num, margin=triplet_margin)
        log["triplet_loss"] = tloss
        total = total + tloss

    log["reid_loss"] = total
    return total, log
