"""ImageReIDNet — Siamese image re-identification over ViT token sequences.

Behavioral rebuild of the reference ImageReIDNet (ReIDNet.py:838-1397):
ViT backbone on both 224x224 crops in one 2B batch, per-token downsample MLP
(dim -> 64) before matching, 2-stage no-xyz cross-attention (cross_lin_attn)
match head, plus cls / fp / visibility aux heads. Channel-last throughout;
the reference's (B, C, N) permutes vanish.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import pooled_feats
from .registry import build_head, build_stage
from .vit import build_vit


class ImageReIDNet(nn.Module):
    """Config fields mirror the reference constructor (ReIDNet.py:841-886)."""

    backbone: str = "deit-tiny"
    cross_lin_attn: Any = None
    match_head: Any = None
    cls_head: Any = None
    fp_head: Any = None
    vis_head: Any = None
    downsample: Any = None
    dim: int = 192
    downsample_dim: int = 64
    combine: str = "point-cat"
    match_type: str = "xcorr_eff"
    pool_type: str = "both"
    output_sequence_size: int = 198
    freeze_backbone: bool = False
    pretrained: bool = False
    image_size: int = 224
    dtype: Any = jnp.float32

    def setup(self):
        self._backbone = build_vit(self.backbone, image_size=self.image_size,
                                   dtype=self.dtype, name="backbone")
        self._cross_stage1 = build_stage(self.cross_lin_attn, dtype=self.dtype,
                                         name="cross_stage1")
        self._cross_stage2 = build_stage(self.cross_lin_attn, dtype=self.dtype,
                                         name="cross_stage2")
        self._match_head = build_head(self.match_head, dtype=self.dtype,
                                      name="match_head")
        self._cls_head = build_head(self.cls_head, dtype=self.dtype,
                                    name="cls_head")
        self._fp_head = build_head(self.fp_head, dtype=self.dtype,
                                   name="fp_head")
        self._vis_head = build_head(self.vis_head, dtype=self.dtype,
                                    name="vis_head")
        self._downsample = build_head(self.downsample, dtype=self.dtype,
                                      name="downsample")

    # ---- embedding ---------------------------------------------------------

    def embed(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, 3, H, W) -> (B, N_tok, dim) token features
        (forward_inference, ReIDNet.py:914-926)."""
        feats = self._backbone(images, train=train)
        if self.freeze_backbone:
            feats = jax.lax.stop_gradient(feats)
        return feats

    def siamese(self, img_1: jnp.ndarray, img_2: jnp.ndarray,
                train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b = img_1.shape[0]
        h = self.embed(jnp.concatenate([img_1, img_2], axis=0), train=train)
        return h[:b], h[b:]

    def downsample_tokens(self, h: jnp.ndarray, train: bool = False
                          ) -> jnp.ndarray:
        """Per-token downsample dim -> downsample_dim before matching.

        Applied on flattened (B*S, C) rows so the LinearRes GroupNorm
        normalizes each token independently (torch GroupNorm on 2-D input).
        The reference reshapes (b, c, s) -> (-1, c) with s != c
        (ReIDNet.py:1233-1234), which scrambles tokens across the channel
        axis — a documented bug we do not carry; the per-token semantics here
        are the intended ones.
        """
        b, s_len, c = h.shape
        hd = self._downsample(h.reshape(-1, c), train=train)
        return hd.reshape(b, s_len, -1)

    # ---- match -------------------------------------------------------------

    def _combine(self, o1, o2):
        if self.combine == "add":
            return o1 + o2
        if self.combine == "minus":
            return o1 - o2
        if self.combine == "cat":
            return jnp.concatenate([o1, o2], axis=-1)
        if self.combine == "point-cat":
            return jnp.concatenate([o1, o2], axis=1)
        raise NotImplementedError(self.combine)

    def xcorr_eff(self, o1, o2):
        """Symmetric 2-stage cross attention, no positions
        (ImageReIDNet.xcorr_eff, ReIDNet.py:896-912)."""
        o1_a = self._cross_stage1(o1, o2)
        o2_a = self._cross_stage1(o2, o1)
        o1_b = self._cross_stage2(o1_a, o2_a)
        o2_b = self._cross_stage2(o2_a, o1_a)
        return self._combine(o1_b, o2_b)

    def match_logits(self, h1d, h2d, train: bool = True) -> jnp.ndarray:
        if self.match_type == "xcorr_eff":
            pooled = pooled_feats(self.xcorr_eff(h1d, h2d), self.pool_type)
        elif self.match_type == "concat":
            pooled = jnp.concatenate([pooled_feats(h1d, self.pool_type),
                                      pooled_feats(h2d, self.pool_type)], -1)
        else:
            raise NotImplementedError(self.match_type)
        return self._match_head(pooled, train=train)[..., 0]

    def match_logits_grid(self, h_t, h_d, train: bool = False,
                          pair_sharding=None) -> jnp.ndarray:
        """All-pairs image match logits with per-object work hoisted out of
        the pair batch (same factorization as ReIDNet.match_logits_grid —
        CrossLinAttn has no pos-MLP, so stage 1 hoists completely).

        Args:
            h_t/h_d: (nt/nd, S, C) downsampled token features.
            pair_sharding: optional NamedSharding for the flattened pair axis.
        Returns:
            (nt, nd) match logits.
        """
        nt, nd = h_t.shape[0], h_d.shape[0]
        stoks = h_t.shape[1]

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

        s1_cfg = dict(self.cross_lin_attn or {})
        if (self.match_type != "xcorr_eff"
                or s1_cfg.get("type") != "cross_lin_attn"
                or s1_cfg.get("attention", "linear") != "linear"):
            h1, h2 = pair(h_t, h_d)
            logits = self.match_logits(h1, h2, train=train)
            return logits.reshape(nt, nd)

        s1, s2 = self._cross_stage1, self._cross_stage2
        q_t, q_d = s1.query_features(h_t), s1.query_features(h_d)
        kv_t, ks_t = s1.template_summary(h_t)
        kv_d, ks_d = s1.template_summary(h_d)

        h1, h2 = pair(h_t, h_d)
        q1, q2 = pair(q_t, q_d)
        kv1, kv2 = pair(kv_t, kv_d)
        ks1, ks2 = pair(ks_t, ks_d)
        o1_a = s1.finish_from_summary(h1, q1, kv2, ks2, stoks)
        o2_a = s1.finish_from_summary(h2, q2, kv1, ks1, stoks)
        o1_b = s2(o1_a, o2_a)
        o2_b = s2(o2_a, o1_a)
        pooled = pooled_feats(self._combine(o1_b, o2_b), self.pool_type)
        logits = self._match_head(pooled, train=train)[..., 0]
        return logits.reshape(nt, nd)

    # ---- full forward ------------------------------------------------------

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = True,
                 with_aux: bool = True) -> Dict[str, jnp.ndarray]:
        """forward_train/forward_test surface (ReIDNet.py:1205-1308)."""
        h1, h2 = self.siamese(batch["sparse_1"], batch["sparse_2"],
                              train=train)
        out: Dict[str, jnp.ndarray] = dict(h1=h1, h2=h2)
        h_cat = jnp.concatenate([h1, h2], axis=0)

        if with_aux and self._cls_head is not None:
            out["cls_logits"] = self._cls_head(
                pooled_feats(h_cat, self.pool_type), train=train)
        if with_aux and self._fp_head is not None:
            out["fp_logits"] = self._fp_head(
                pooled_feats(h_cat, self.pool_type), train=train)[..., 0]
        if with_aux and self._vis_head is not None:
            out["vis_logits"] = self._vis_head(
                pooled_feats(h_cat, self.pool_type), train=train)

        if "id_1" in batch:
            out["match"] = (batch["id_1"] == batch["id_2"]).astype(jnp.float32)

        hd = self.downsample_tokens(h_cat, train=train)
        b = h1.shape[0]
        h1d, h2d = hd[:b], hd[b:]
        out["h1d"], out["h2d"] = h1d, h2d
        out["match_logits"] = self.match_logits(h1d, h2d, train=train)
        return out
