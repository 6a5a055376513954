"""Attention blocks of the ReID models, flax linen, channel-last (B, N, C).

Mirrors the reference block zoo behaviorally:
  SelfAttentionBlock    <- Self_Attention        (pointnet2_utils.py:55-114)
  CrossAttentionBlock   <- corss_attention [sic] (attention.py:157-219)
  LocalSelfAttention    <- local_self_attention  (attention.py:221-296)
  CrossLinAttn          <- cross_lin_attn        (attention.py:312-370)
  FPSA                  <- FP_SA                 (pointnet2_utils.py:362-437)

All use the shared linear-attention primitive (ops/attention.py). Parameter names
track the reference state-dict keys so the torch checkpoint converter
(train/convert.py) is a pure name-map.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import knn_feature_space, index_points
from ..ops.attention import full_attention, linear_attention
from .layers import PosMLP


def _attn_fn(kind: str):
    """Dispatch the attention primitive by config string.

    'linear'        — XLA linear attention (default, mask-capable).
    'linear-pallas' — fused VMEM-resident Pallas kernel (ops.pallas); falls
                      back to the XLA path when masks are supplied.
    'full'          — softmax attention.
    """
    if kind == "linear":
        return linear_attention
    if kind == "linear-pallas":
        from ..ops.pallas import linear_attention_pallas

        def attn(q, k, v, q_mask=None, kv_mask=None):
            if q_mask is None and kv_mask is None:
                return linear_attention_pallas(q, k, v)
            return linear_attention(q, k, v, q_mask=q_mask, kv_mask=kv_mask)

        return attn
    return full_attention


def _split_heads(x: jnp.ndarray, nhead: int) -> jnp.ndarray:
    B, N, C = x.shape
    return x.reshape(B, N, nhead, C // nhead)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    B, N, H, D = x.shape
    return x.reshape(B, N, H * D)


class SelfAttentionBlock(nn.Module):
    """Positional self-attention + FFN with residual.

    forward(feat (B,N,C), xyz (B,N,3)) -> (B,N,C):
      feat_pos = feat + pos_mlp(xyz); q,k,v all from feat_pos;
      msg = LN(merge(linattn(q,k,v))); msg = LN(FFN([feat || msg])); out = feat + msg.
    """

    d_model: int
    nhead: int
    attention: str = "linear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, xyz: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        d = self.d_model
        feat_pos = feat + PosMLP(d, dtype=self.dtype, name="pos_mlp")(xyz)

        q = _split_heads(nn.Dense(d, use_bias=False, dtype=self.dtype,
                                  name="q_proj")(feat_pos), self.nhead)
        k = _split_heads(nn.Dense(d, use_bias=False, dtype=self.dtype,
                                  name="k_proj")(feat_pos), self.nhead)
        v = _split_heads(nn.Dense(d, use_bias=False, dtype=self.dtype,
                                  name="v_proj")(feat_pos), self.nhead)

        attn = _attn_fn(self.attention)
        msg = _merge_heads(attn(q, k, v, q_mask=mask, kv_mask=mask))
        msg = nn.Dense(d, use_bias=False, dtype=self.dtype, name="merge")(msg)
        msg = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(msg)

        h = jnp.concatenate([feat, msg], axis=-1)
        h = nn.Dense(2 * d, use_bias=False, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.relu(h)
        h = nn.Dense(d, use_bias=False, dtype=self.dtype, name="mlp_fc2")(h)
        msg = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(h)

        return feat + msg


class _CrossDecomposable:
    """Shared machinery for the cross-attention blocks: the merge/LN/FFN tail
    and the linear-attention pair-grid decomposition (queries and the
    finish-from-summary step are identical for the point and image variants;
    only template_summary differs — the point block injects the pos-MLP into
    the values)."""

    def _ffn(self, search_feat: jnp.ndarray, msg: jnp.ndarray) -> jnp.ndarray:
        msg = self.merge(msg)
        msg = self.norm1(msg)
        h = jnp.concatenate([search_feat, msg], axis=-1)
        h = self.mlp_fc1(h)
        h = nn.relu(h)
        h = self.mlp_fc2(h)
        return search_feat + self.norm2(h)

    def query_features(self, search_feat: jnp.ndarray) -> jnp.ndarray:
        """Per-object search-side queries: (B, N, H, D) = elu(q_proj) + 1."""
        from ..ops.attention import elu_feature_map
        return elu_feature_map(_split_heads(self.q_proj(search_feat),
                                            self.nhead))

    def finish_from_summary(self, search_feat: jnp.ndarray,
                            queries: jnp.ndarray, kv: jnp.ndarray,
                            ksum: jnp.ndarray, v_length: int,
                            eps: float = 1e-6) -> jnp.ndarray:
        """Per-pair tail: message from the factored pieces, then merge/LN/FFN.

        search_feat (P, N, C), queries (P, N, H, D), kv (P, H, D, V),
        ksum (P, H, D); v_length is the STATIC template token count.
        """
        z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", queries, ksum) + eps)
        msg = jnp.einsum("nlhd,nhdv,nlh->nlhv", queries, kv, z) * v_length
        return self._ffn(search_feat, _merge_heads(msg))


class CrossAttentionBlock(_CrossDecomposable, nn.Module):
    """Cross-attention where the positional encoding enters through the TEMPLATE
    values only (the reference's deliberate asymmetry, attention.py:203-209).

    forward(search_feat (B,Ns,C), search_xyz, template_feat (B,Nt,C), template_xyz).

    Besides the plain forward, the block exposes a DECOMPOSED path for the
    NxM pair-grid workload (SURVEY.md §3.5): with linear attention every
    per-pair quantity factorizes into per-object pieces —
      search side:   Q' = elu(q_proj(search)) + 1                (query_features)
      template side: KV = K'^T (V / S),  Ksum = sum_s K'         (template_summary)
      per pair:      msg = (Q' KV) / (Q' Ksum + eps) * S, then merge/LN/FFN
                                                               (finish_from_summary)
    so the q/k/v projections and the KV contraction run ONCE per object instead
    of once per pair — the pair grid only pays the (N,D)x(D,V) message einsum
    and the FFN. Numerics are identical to __call__ (same primitive, same
    einsum order); tests/test_pair_grid.py asserts equality.
    """

    d_model: int
    nhead: int
    attention: str = "linear"
    dtype: Any = jnp.float32

    def setup(self):
        # attribute names ARE the param-tree names (identical to the previous
        # @nn.compact name= kwargs — checkpoint converter map unchanged)
        d = self.d_model
        self.pos_mlp = PosMLP(d, dtype=self.dtype)
        self.q_proj = nn.Dense(d, use_bias=False, dtype=self.dtype)
        self.k_proj = nn.Dense(d, use_bias=False, dtype=self.dtype)
        self.v_proj = nn.Dense(d, use_bias=False, dtype=self.dtype)
        self.merge = nn.Dense(d, use_bias=False, dtype=self.dtype)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.mlp_fc1 = nn.Dense(2 * d, use_bias=False, dtype=self.dtype)
        self.mlp_fc2 = nn.Dense(d, use_bias=False, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

    def __call__(self, search_feat, search_xyz, template_feat, template_xyz,
                 mask: Optional[jnp.ndarray] = None,
                 template_pos: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """template_pos: optional precomputed pos_mlp(template_xyz) — the
        pair-grid path hoists it per object (it depends only on xyz)."""
        if template_pos is None:
            template_pos = self.pos_mlp(template_xyz)
        template_pos = template_feat + template_pos
        q = _split_heads(self.q_proj(search_feat), self.nhead)
        k = _split_heads(self.k_proj(template_feat), self.nhead)
        v = _split_heads(self.v_proj(template_pos), self.nhead)
        attn = _attn_fn(self.attention)
        msg = _merge_heads(attn(q, k, v))
        return self._ffn(search_feat, msg)

    # ---- decomposed pair-grid path (linear attention only) -----------------

    def template_summary(self, template_feat: jnp.ndarray,
                         template_xyz: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-object template-side summaries: KV (B, H, D, V), Ksum (B, H, D).

        Values carry the 1/v_length pre-scale (the reference's fp16 guard,
        attention.py:47) so finish_from_summary re-multiplies by S exactly as
        linear_attention does.
        """
        from ..ops.attention import elu_feature_map
        template_pos = template_feat + self.pos_mlp(template_xyz)
        k = elu_feature_map(_split_heads(self.k_proj(template_feat),
                                         self.nhead))
        v = _split_heads(self.v_proj(template_pos), self.nhead)
        s = v.shape[1]
        kv = jnp.einsum("nshd,nshv->nhdv", k, v / s)
        ksum = k.sum(axis=1)
        return kv, ksum


class CrossLinAttn(_CrossDecomposable, nn.Module):
    """No-xyz cross-attention block for image token sequences
    (attention.py:312-370; the pos_mlp exists in the reference's parameters but is
    unused in its forward — we omit it and the converter drops those weights).

    Exposes the same decomposed pair-grid path as CrossAttentionBlock
    (query_features / template_summary / finish_from_summary) so the image
    NxM tracking grid also hoists per-object work out of the pair batch."""

    d_model: int
    nhead: int
    attention: str = "linear"
    dtype: Any = jnp.float32

    def setup(self):
        d = self.d_model
        self.q_proj = nn.Dense(d, use_bias=False, dtype=self.dtype)
        self.k_proj = nn.Dense(d, use_bias=False, dtype=self.dtype)
        self.v_proj = nn.Dense(d, use_bias=False, dtype=self.dtype)
        self.merge = nn.Dense(d, use_bias=False, dtype=self.dtype)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.mlp_fc1 = nn.Dense(2 * d, use_bias=False, dtype=self.dtype)
        self.mlp_fc2 = nn.Dense(d, use_bias=False, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

    def __call__(self, search_feat, template_feat,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        q = _split_heads(self.q_proj(search_feat), self.nhead)
        k = _split_heads(self.k_proj(template_feat), self.nhead)
        v = _split_heads(self.v_proj(template_feat), self.nhead)
        attn = _attn_fn(self.attention)
        msg = _merge_heads(attn(q, k, v))
        return self._ffn(search_feat, msg)

    def template_summary(self, template_feat: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-object template summaries: KV (B, H, D, V), Ksum (B, H, D)."""
        from ..ops.attention import elu_feature_map
        k = elu_feature_map(_split_heads(self.k_proj(template_feat),
                                         self.nhead))
        v = _split_heads(self.v_proj(template_feat), self.nhead)
        s = v.shape[1]
        kv = jnp.einsum("nshd,nshv->nhdv", k, v / s)
        ksum = k.sum(axis=1)
        return kv, ksum


class LocalSelfAttention(nn.Module):
    """kNN-in-feature-space local attention (used only by the 'xcorr' match type).

    Each point attends over its k feature-space neighbors; the (B*N, 1+K) problem is
    expressed as a batched linear attention with L=1 queries (attention.py:221-296).
    """

    d_model: int
    nhead: int
    knum: int = 32
    pos_size: Optional[int] = None   # must equal d_model when set (the pos
                                     # output is ADDED to d_model features —
                                     # same constraint as the reference,
                                     # attention.py:62-63)
    attention: str = "linear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, search_feat: jnp.ndarray, search_xyz: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, N, C = search_feat.shape
        k = self.knum

        # NOTE: pos_size < d_model relies on broadcasting in the reference;
        # we project pos to d_model-compatible size by matching the reference:
        if self.pos_size is not None and self.pos_size != self.d_model:
            raise ValueError(
                f"local_self_attention pos_size={self.pos_size} must equal "
                f"d_model={self.d_model}: the positional encoding is added "
                "to the features (reference attention.py:62-63)")
        pos_dim = self.d_model

        kidx = knn_feature_space(jnp.swapaxes(search_feat, -1, -2), k)   # (B,N,k)
        fea_knn = index_points(search_feat, kidx)                        # (B,N,k,C)
        xyz_knn = index_points(search_xyz, kidx)                         # (B,N,k,3)

        pos = PosMLP(pos_dim, dtype=self.dtype, name="pos_mlp_knn")
        center = search_feat + pos(search_xyz)                           # (B,N,C)
        neigh = fea_knn + pos(xyz_knn)                                   # (B,N,k,C)

        q = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="q_proj_knn")(center).reshape(B * N, 1, self.nhead, -1)
        kk = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                      name="k_proj_knn")(neigh).reshape(B * N, k, self.nhead, -1)
        vv = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                      name="v_proj_knn")(neigh).reshape(B * N, k, self.nhead, -1)

        attn = _attn_fn(self.attention)
        msg = attn(q, kk, vv).reshape(B * N, 1, self.d_model)
        msg = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                       name="merge_knn")(msg)
        msg = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1_knn")(msg)

        center_flat = search_feat.reshape(B * N, 1, C)
        h = jnp.concatenate([center_flat, msg], axis=-1)
        h = nn.Dense(2 * self.d_model, use_bias=False, dtype=self.dtype,
                     name="mlp_knn_fc1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="mlp_knn_fc2")(h)
        msg = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2_knn")(h)

        return (center_flat + msg).reshape(B, N, self.d_model)


class FPSA(nn.Module):
    """Attention-based feature propagation (coarse -> fine upsampling).

    query from fine features (no pos), key from coarse features (no pos), value from
    coarse features + pos_mlp2(coarse xyz); output has no residual and is projected
    to out_dim (pointnet2_utils.py:362-437).
    """

    feat1_dim: int
    feat2_dim: int
    d_model: int
    out_dim: int
    nhead: int = 2
    attention: str = "linear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat1, xyz1, feat2, xyz2,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        d = self.d_model
        feat2_pos = feat2 + PosMLP(d, d_out=self.feat2_dim, dtype=self.dtype,
                                   name="pos_mlp2")(xyz2)

        q = _split_heads(nn.Dense(d, use_bias=False, dtype=self.dtype,
                                  name="q_proj")(feat1), self.nhead)
        k = _split_heads(nn.Dense(d, use_bias=False, dtype=self.dtype,
                                  name="k_proj")(feat2), self.nhead)
        v = _split_heads(nn.Dense(d, use_bias=False, dtype=self.dtype,
                                  name="v_proj")(feat2_pos), self.nhead)

        attn = _attn_fn(self.attention)
        msg = _merge_heads(attn(q, k, v))
        msg = nn.Dense(d, use_bias=False, dtype=self.dtype, name="merge")(msg)
        msg = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(msg)

        h = jnp.concatenate([feat1, msg], axis=-1)
        h = nn.Dense(2 * d, use_bias=False, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                     name="mlp_fc2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
