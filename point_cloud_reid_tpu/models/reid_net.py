"""ReIDNet — the central Siamese point-cloud re-identification model.

Behavioral rebuild of the reference ReIDNet (mmdet3d/models/ReIDNet.py:112-776) and
ReIDNetCosine (:779-809), redesigned TPU-first:

  * channel-last (B, N, C) tensors everywhere — pointwise convs become Dense matmuls
    that tile directly onto the MXU; the reference's (B, C, N) layout maps by a
    transpose at the framework boundary.
  * one flax module with pure methods; train/eval loss computation lives in
    train/losses.py as pure functions of the forward outputs (the reference fuses
    losses into forward_train; we keep forward jit-compiled and side-effect free).
  * the siamese trick is identical: both crops are concatenated into one 2B batch
    through the backbone so BatchNorm sees both views (ReIDNet.py:311-332) — under
    pjit with a batch-sharded input the BN statistics are global, giving SyncBN
    semantics without the reference's hand-rolled all-reduce (ops/norm.py).

Match head zoo (ReIDNet.py:231-264, 387-440):
  'xcorr_eff'      — symmetric 2-stage cross-attention, combine ∈ add/minus/cat/
                     point-cat (the released-config path).
  'xcorr'          — cross + local-self-attention stages, asymmetric.
  'xcorr-baseline' — cross stages only, asymmetric.
  'concat'         — pooled-feature concat MLP.
Cosine variant: scaled cosine similarity between pooled embeddings (ReIDNet.py:779;
the reference's missing-target bce call there is a documented bug we fix).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import pooled_feats
from .registry import build_backbone, build_head, build_stage


class ReIDNet(nn.Module):
    """Point-branch ReID network.

    Config fields mirror the reference constructor (ReIDNet.py:113-167) so the
    reidentifier config dicts translate 1:1.
    """

    backbone: Dict[str, Any]
    match_head: Any = None
    cls_head: Any = None
    shape_head: Any = None
    fp_head: Any = None
    downsample: Any = None
    cross_stage1: Any = None
    local_stage1: Any = None
    cross_stage2: Any = None
    local_stage2: Any = None
    hidden_size: int = 64
    match_type: str = "xcorr_eff"
    pool_type: str = "both"
    combine: str = "point-cat"
    backbone_list: Sequence[int] = (128, 64, 32)
    output_sequence_size: int = 32
    use_dgcnn: bool = False
    knn_method: str = "argsort"
    dtype: Any = jnp.float32

    def setup(self):
        self._backbone = build_backbone(dict(self.backbone), dtype=self.dtype,
                                        knn_method=self.knn_method)
        self._match_head = build_head(self.match_head, dtype=self.dtype,
                                      name="match_head")
        self._cls_head = build_head(self.cls_head, dtype=self.dtype, name="cls_head")
        self._shape_head = build_head(self.shape_head, dtype=self.dtype,
                                      name="shape_head")
        self._fp_head = build_head(self.fp_head, dtype=self.dtype, name="fp_head")
        self._downsample = build_head(self.downsample, dtype=self.dtype,
                                      name="downsample")
        self._cross_stage1 = build_stage(self.cross_stage1, dtype=self.dtype,
                                         name="cross_stage1")
        self._local_stage1 = build_stage(self.local_stage1, dtype=self.dtype,
                                         name="local_stage1")
        self._cross_stage2 = build_stage(self.cross_stage2, dtype=self.dtype,
                                         name="cross_stage2")
        self._local_stage2 = build_stage(self.local_stage2, dtype=self.dtype,
                                         name="local_stage2")

    # ---- embedding ---------------------------------------------------------

    def embed(self, pts: jnp.ndarray, train: bool = False
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Backbone embedding of a batch of crops: (B, N, 3) -> xyz, (B, N, C).

        Equivalent of forward_inference (ReIDNet.py:189-192) — the amortized
        per-object stage of the NxN tracking workload (§3.5).
        """
        xyz, h = self._backbone(pts, list(self.backbone_list), train=train)
        if self.use_dgcnn and self._downsample is not None:
            h = self._downsample(h, train=train)
        return xyz, h

    def siamese(self, sparse_1: jnp.ndarray, sparse_2: jnp.ndarray,
                train: bool = True):
        """Concat both crops into one 2B batch through the backbone, then split
        (ReIDNet.py:311-332). BN statistics therefore cover both views."""
        b = sparse_1.shape[0]
        xyz, h = self.embed(jnp.concatenate([sparse_1, sparse_2], axis=0),
                            train=train)
        return xyz[:b], xyz[b:], h[:b], h[b:]

    # ---- match heads -------------------------------------------------------

    def _combine(self, o1: jnp.ndarray, o2: jnp.ndarray) -> jnp.ndarray:
        # channel-last: reference dim=1 (channels in (B,C,N)) -> axis=-1;
        # dim=2 (points) -> axis=1 (ReIDNet.py:244-249)
        if self.combine == "add":
            return o1 + o2
        if self.combine == "minus":
            return o1 - o2
        if self.combine == "cat":
            return jnp.concatenate([o1, o2], axis=-1)
        if self.combine == "point-cat":
            return jnp.concatenate([o1, o2], axis=1)
        raise NotImplementedError(self.combine)

    def xcorr_eff(self, o1, xyz1, o2, xyz2):
        """Symmetric 2-stage cross-attention with shared weights per stage
        (ReIDNet.py:231-249)."""
        o1_a = self._cross_stage1(o1, xyz1, o2, xyz2)
        o2_a = self._cross_stage1(o2, xyz2, o1, xyz1)
        o1_b = self._cross_stage2(o1_a, xyz1, o2_a, xyz2)
        o2_b = self._cross_stage2(o2_a, xyz2, o1_a, xyz1)
        return self._combine(o1_b, o2_b), o1_b, o2_b

    def xcorr(self, search_feat, search_xyz, template_feat, template_xyz):
        """Asymmetric cross + local self-attention stages (ReIDNet.py:250-257)."""
        h = self._cross_stage1(search_feat, search_xyz, template_feat, template_xyz)
        h = self._local_stage1(h, search_xyz)
        h = self._cross_stage2(h, search_xyz, template_feat, template_xyz)
        return self._local_stage2(h, search_xyz)

    def xcorr_baseline(self, search_feat, search_xyz, template_feat, template_xyz):
        """Cross stages only (ReIDNet.py:258-264)."""
        h = self._cross_stage1(search_feat, search_xyz, template_feat, template_xyz)
        return self._cross_stage2(h, search_xyz, template_feat, template_xyz)

    def match_logits(self, h1, xyz1, h2, xyz2, train: bool = True):
        """Pairwise match logit for aligned pairs: (B,) raw BCE logits
        (ReIDNet.py:387-440 / match_forward_inference :444-462).

        Returns (logits, (o1, o2)) where o1/o2 are the post-cross-attention
        per-point features (xcorr_eff only; used by use_o triplet mode).
        """
        o1 = o2 = None
        if self.match_type == "xcorr_eff":
            match_in, o1, o2 = self.xcorr_eff(h1, xyz1, h2, xyz2)
            pooled = pooled_feats(match_in, self.pool_type)
        elif self.match_type == "xcorr":
            pooled = pooled_feats(self.xcorr(h1, xyz1, h2, xyz2), self.pool_type)
        elif self.match_type == "xcorr-baseline":
            pooled = pooled_feats(self.xcorr_baseline(h1, xyz1, h2, xyz2),
                                  self.pool_type)
        elif self.match_type == "concat":
            pooled = jnp.concatenate([pooled_feats(h1, self.pool_type),
                                      pooled_feats(h2, self.pool_type)], axis=-1)
        else:
            raise NotImplementedError(self.match_type)
        logits = self._match_head(pooled, train=train)[..., 0]
        return logits, (o1, o2)

    def match_logits_grid(self, h_t, xyz_t, h_d, xyz_d, train: bool = False,
                          pair_sharding=None) -> jnp.ndarray:
        """All-pairs match logits from per-object embeddings: the NxM tracking
        grid (SURVEY.md §3.5) as ONE program with per-OBJECT work hoisted out
        of the pair batch.

        The profiled 128x128 frame is HBM-bandwidth-bound (~700 GB/s); the
        naive pair grid re-projects q/k/v and re-reduces KV for every pair.
        With linear attention those factorize per object (CrossAttentionBlock
        decomposed path), so stage 1 pays only the (N,D)x(D,V) message einsum
        + FFN per pair. Stage 2 consumes pair-dependent features and runs in
        full. Numerically equivalent to pairing + match_logits (tested).

        Args:
            h_t/xyz_t: (nt, N, C)/(nt, N, 3) track embeddings.
            h_d/xyz_d: (nd, ...) detection embeddings.
            pair_sharding: optional NamedSharding for the flattened pair axis
                (multi-chip scale-out; applied to every per-pair tensor).
        Returns:
            (nt, nd) match logits.
        """
        nt, nd = h_t.shape[0], h_d.shape[0]
        npts = h_t.shape[1]

        def shard(x):
            if pair_sharding is not None:
                return jax.lax.with_sharding_constraint(x, pair_sharding)
            return x

        def pair(a, b):
            pa = jnp.broadcast_to(a[:, None], (nt, nd) + a.shape[1:]
                                  ).reshape((nt * nd,) + a.shape[1:])
            pb = jnp.broadcast_to(b[None, :], (nt, nd) + b.shape[1:]
                                  ).reshape((nt * nd,) + b.shape[1:])
            return shard(pa), shard(pb)

        stage1_cfg = self.cross_stage1 or {}
        if (self.match_type != "xcorr_eff"
                or stage1_cfg.get("type") != "corss_attention"
                or stage1_cfg.get("attention", "linear") != "linear"):
            # generic fallback: materialize the pair batch, reuse match_logits
            h1, h2 = pair(h_t, h_d)
            x1, x2 = pair(xyz_t, xyz_d)
            logits, _ = self.match_logits(h1, x1, h2, x2, train=train)
            return logits.reshape(nt, nd)

        s1 = self._cross_stage1
        # per-object factors (nt + nd backbone-sized tensors, NOT nt*nd)
        q_t = s1.query_features(h_t)
        q_d = s1.query_features(h_d)
        kv_t, ks_t = s1.template_summary(h_t, xyz_t)
        kv_d, ks_d = s1.template_summary(h_d, xyz_d)

        h1, h2 = pair(h_t, h_d)
        q1, q2 = pair(q_t, q_d)
        kv1, kv2 = pair(kv_t, kv_d)
        ks1, ks2 = pair(ks_t, ks_d)
        o1_a = s1.finish_from_summary(h1, q1, kv2, ks2, npts)
        o2_a = s1.finish_from_summary(h2, q2, kv1, ks1, npts)

        # stage 2 consumes pair-dependent features; only its pos-MLP factors
        # per object (same-type check above guarantees the kwarg exists)
        s2 = self._cross_stage2
        pos1, pos2 = pair(s2.pos_mlp(xyz_t), s2.pos_mlp(xyz_d))
        o1_b = s2(o1_a, None, o2_a, None, template_pos=pos2)
        o2_b = s2(o2_a, None, o1_a, None, template_pos=pos1)
        pooled = pooled_feats(self._combine(o1_b, o2_b), self.pool_type)
        logits = self._match_head(pooled, train=train)[..., 0]
        return logits.reshape(nt, nd)

    # ---- aux heads ---------------------------------------------------------

    def cls_logits(self, h_cat: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """Object-class logits from pooled per-point features (ReIDNet.py:348-366)."""
        return self._cls_head(pooled_feats(h_cat, self.pool_type), train=train)

    def fp_logits(self, h_cat: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """False-positive ("is this a real object?") logit (ReIDNet.py:368-385)."""
        return self._fp_head(pooled_feats(h_cat, self.pool_type), train=train)[..., 0]

    def shape_points(self, h_cat: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """Per-point coordinate regression for the chamfer shape loss
        (ReIDNet.py:508-523); (B, N, C) -> (B, N, 3)."""
        return self._shape_head(h_cat, train=train)

    # ---- full forward ------------------------------------------------------

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = True,
                 with_aux: bool = True) -> Dict[str, jnp.ndarray]:
        """Full training/eval forward (ReIDNet.py:586-689 minus loss arithmetic).

        batch keys: sparse_1, sparse_2 (B,N,3); optionally dense_1, dense_2,
        label_1, label_2, id_1, id_2. Returns every tensor the loss/metric layer
        needs. Aux heads run only when configured AND with_aux.
        """
        xyz1, xyz2, h1, h2 = self.siamese(batch["sparse_1"], batch["sparse_2"],
                                          train=train)
        out: Dict[str, jnp.ndarray] = dict(xyz1=xyz1, xyz2=xyz2, h1=h1, h2=h2)

        h_cat = jnp.concatenate([h1, h2], axis=0)
        if with_aux and self._cls_head is not None:
            out["cls_logits"] = self.cls_logits(h_cat, train=train)
        if with_aux and self._fp_head is not None:
            out["fp_logits"] = self.fp_logits(h_cat, train=train)
        if with_aux and self._shape_head is not None:
            out["shape_points"] = self.shape_points(h_cat, train=train)

        if "id_1" in batch:
            out["match"] = (batch["id_1"] == batch["id_2"]).astype(jnp.float32)

        logits, (o1, o2) = self.match_logits(h1, xyz1, h2, xyz2, train=train)
        out["match_logits"] = logits
        if o1 is not None:
            out["o1"], out["o2"] = o1, o2
        return out


class ReIDNetCosine(ReIDNet):
    """Scores pairs by scaled cosine similarity of pooled embeddings
    (ReIDNet.py:779-809). The x10 scale keeps BCE gradients alive."""

    def match_logits(self, h1, xyz1, h2, xyz2, train: bool = True):
        p1 = pooled_feats(h1, self.pool_type)
        p2 = pooled_feats(h2, self.pool_type)
        n1 = p1 / (jnp.linalg.norm(p1, axis=-1, keepdims=True) + 1e-8)
        n2 = p2 / (jnp.linalg.norm(p2, axis=-1, keepdims=True) + 1e-8)
        return jnp.sum(n1 * n2, axis=-1) * 10.0, (None, None)

    def match_logits_grid(self, h_t, xyz_t, h_d, xyz_d, train: bool = False,
                          pair_sharding=None) -> jnp.ndarray:
        """Cosine scoring factorizes completely: pool + normalize per object,
        then the whole NxM grid is ONE (nt, C)x(C, nd) matmul."""
        p1 = pooled_feats(h_t, self.pool_type)
        p2 = pooled_feats(h_d, self.pool_type)
        n1 = p1 / (jnp.linalg.norm(p1, axis=-1, keepdims=True) + 1e-8)
        n2 = p2 / (jnp.linalg.norm(p2, axis=-1, keepdims=True) + 1e-8)
        return (n1 @ n2.T) * 10.0
