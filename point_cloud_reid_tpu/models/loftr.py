"""LoFTR-style local feature transformer (self/cross attention encoder).

Behavioral rebuild of mmdet3d/models/trackers/deprecated/loftr.py:7-99 —
dead code in the reference (imports commented out, trackers/__init__.py:1-26);
here it is live and registered as an attention stage
(`build_stage(type='loftr')`) so the alternative matching encoder is reachable.

Each layer: bias-free multi-head q/k/v projections -> full (softmax) or
linear attention -> bias-free merge -> LayerNorm -> FFN on [x || message] ->
LayerNorm -> residual. The transformer alternates self and cross layers over
the two feature sets; the reference deep-copies a prototype layer, i.e.
independent weights per layer, which flax gives naturally.

Attention primitives are the shared ops (ops/attention.py) whose numerics are
golden-tested against the reference's attention.py:20-91, including the
1/v_length linear-attention rescale and the nan_to_num in masked softmax.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import full_attention, linear_attention


class LoFTREncoderLayer(nn.Module):
    """One self- or cross-attention layer (loftr.py:7-59)."""

    d_model: int
    nhead: int
    attention: str = "full"         # 'full' | 'linear'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, source: jnp.ndarray,
                 x_mask: Optional[jnp.ndarray] = None,
                 source_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x: (B, L, C); source: (B, S, C); masks (B, L) / (B, S)."""
        B, L, _ = x.shape
        dim = self.d_model // self.nhead
        dense = lambda name: nn.Dense(self.d_model, use_bias=False,
                                      dtype=self.dtype, name=name)
        q = dense("q_proj")(x).reshape(B, L, self.nhead, dim)
        k = dense("k_proj")(source).reshape(B, -1, self.nhead, dim)
        v = dense("v_proj")(source).reshape(B, -1, self.nhead, dim)
        attn = linear_attention if self.attention == "linear" else full_attention
        msg = attn(q, k, v, q_mask=x_mask, kv_mask=source_mask)
        msg = dense("merge")(msg.reshape(B, L, self.d_model))
        msg = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(msg)
        # FFN over the concatenation [x || message] (loftr.py:55-57)
        h = jnp.concatenate([x, msg], axis=-1)
        h = nn.Dense(2 * self.d_model, use_bias=False, dtype=self.dtype,
                     name="mlp_0")(h)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="mlp_2")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
        return x + h


class LocalFeatureTransformer(nn.Module):
    """Alternating self/cross encoder over two feature sets (loftr.py:62-99)."""

    d_model: int
    nhead: int = 8
    layer_names: Sequence[str] = ("self", "cross") * 4
    attention: str = "full"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat0: jnp.ndarray, feat1: jnp.ndarray,
                 mask0: Optional[jnp.ndarray] = None,
                 mask1: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert feat0.shape[-1] == self.d_model, "feature dim != d_model"
        for i, name in enumerate(self.layer_names):
            layer = LoFTREncoderLayer(self.d_model, self.nhead, self.attention,
                                      dtype=self.dtype, name=f"layers_{i}")
            if name == "self":
                feat0 = layer(feat0, feat0, mask0, mask0)
                feat1 = layer(feat1, feat1, mask1, mask1)
            elif name == "cross":
                feat0 = layer(feat0, feat1, mask0, mask1)
                feat1 = layer(feat1, feat0, mask1, mask0)
            else:
                raise KeyError(name)
        return feat0, feat1


class LoFTRStage(nn.Module):
    """Adapter exposing LocalFeatureTransformer through the attention-stage
    interface used by the match heads (x, x_xyz, source, source_xyz) -> x'.

    The reference never wired LoFTR into any head; this adapter is the
    TPU-native way to make it reachable from configs (xyz inputs are ignored —
    LoFTR carries no positional MLP). Symmetric xcorr_eff calls the stage once
    per direction; only the updated query side is returned.
    """

    d_model: int
    nhead: int = 8
    attention: str = "linear"
    n_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_xyz: Optional[jnp.ndarray],
                 source: jnp.ndarray, source_xyz: Optional[jnp.ndarray],
                 x_mask: Optional[jnp.ndarray] = None,
                 source_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        names = ("self", "cross") * self.n_layers
        f0, _ = LocalFeatureTransformer(self.d_model, self.nhead, names,
                                        self.attention, dtype=self.dtype,
                                        name="loftr")(x, source, x_mask,
                                                      source_mask)
        return f0
