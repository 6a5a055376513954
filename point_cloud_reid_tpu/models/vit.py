"""Vision Transformer backbones (DeiT tiny/small/base, BEiT-base) in flax.

TPU-native replacement for the reference's HuggingFace torch backbones
(get_image_model, ReIDNet.py:811-834). One ViT module covers the zoo:

  DeiT-distilled: cls + distillation tokens (198-token output at 224/16 —
    matches the reference's output_sequence_size=198, ReIDNet.py:844).
  BEiT: shared relative-position-bias attention + LayerScale, no absolute
    position embedding (197 tokens).

The reference taps `hidden_states[-1]` for DeiT and `last_hidden_state` for
BEiT (siamese_forward, ReIDNet.py:929-941); both correspond to this module's
final-block output INCLUDING special tokens, before any pooling head. Zero-egress
environments train from scratch ('deit-*-no-pt' configs,
ReIDNet.py:817-825); convert_hf_vit() maps locally-available HF torch weights.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

VIT_PRESETS = {
    # dim, depth, heads — facebook/deit-*-distilled-patch16-224 configs
    # final_norm=False: the reference taps hidden_states[-1] for DeiT — the
    # last encoder block's output BEFORE the model's final LayerNorm
    # (siamese_forward, ReIDNet.py:934-938) — so the flax module skips it.
    "deit-tiny": dict(dim=192, depth=12, heads=3, dist_token=True,
                      final_norm=False),
    "deit-small": dict(dim=384, depth=12, heads=6, dist_token=True,
                       final_norm=False),
    "deit-base": dict(dim=768, depth=12, heads=12, dist_token=True,
                      final_norm=False),
    # 'no-pt' variants are plain ViTModel from config — no distillation
    # token, 197 tokens (get_image_model, ReIDNet.py:818-826)
    "deit-tiny-no-pt": dict(dim=192, depth=12, heads=3, dist_token=False,
                            final_norm=False),
    "deit-base-no-pt": dict(dim=768, depth=12, heads=12, dist_token=False,
                            final_norm=False),
    # microsoft/beit-base-patch16-224-pt22k; taps last_hidden_state (post-LN)
    "beit": dict(dim=768, depth=12, heads=12, dist_token=False,
                 rel_pos_bias=True, layer_scale=True, final_norm=True),
}


class Attention(nn.Module):
    dim: int
    heads: int
    rel_pos_bias: bool = False
    num_rel_pos: int = 0           # (2*14-1)^2 + 3 entries when enabled
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 rel_bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, N, C = x.shape
        h = self.heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, h, C // h), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]          # (B,N,h,d)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(C // h)
        if rel_bias is not None:
            attn = attn + rel_bias[None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    layer_scale: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rel_bias=None):
        def scaled(name, y):
            if not self.layer_scale:
                return y
            g = self.param(name, nn.initializers.constant(0.1), (self.dim,))
            return g * y

        y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm1")(x)
        y = Attention(self.dim, self.heads, dtype=self.dtype,
                      name="attn")(y, rel_bias)
        x = x + scaled("gamma_1", y)
        y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + scaled("gamma_2", y)


class ViT(nn.Module):
    """Patch-embed + token transformer; returns ALL tokens (B, N_tok, dim)."""

    dim: int = 192
    depth: int = 12
    heads: int = 3
    patch: int = 16
    image_size: int = 224
    dist_token: bool = True
    rel_pos_bias: bool = False
    layer_scale: bool = False
    final_norm: bool = True
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """images: (B, 3, H, W) channel-first, as stored in img_crop.bin."""
        B = images.shape[0]
        x = jnp.transpose(images, (0, 2, 3, 1))                # NHWC
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype,
                    name="patch_embed")(x)
        x = x.reshape(B, -1, self.dim)                          # (B, P, dim)
        n_patches = x.shape[1]

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        toks = [jnp.broadcast_to(cls, (B, 1, self.dim))]
        if self.dist_token:
            dist = self.param("dist_token", nn.initializers.zeros,
                              (1, 1, self.dim))
            toks.append(jnp.broadcast_to(dist, (B, 1, self.dim)))
        x = jnp.concatenate(toks + [x], axis=1)
        n_tok = x.shape[1]

        if not self.rel_pos_bias:   # DeiT: learned absolute positions
            pos = self.param("pos_embed", nn.initializers.normal(0.02),
                             (1, n_tok, self.dim))
            x = x + pos

        rel_bias = None
        if self.rel_pos_bias:       # BEiT: shared relative position bias
            side = self.image_size // self.patch
            num_rel = (2 * side - 1) ** 2 + 3
            table = self.param("rel_pos_table", nn.initializers.zeros,
                               (num_rel, self.heads))
            index = self.variable(
                "consts", "rel_pos_index",
                lambda: _relative_position_index(side)).value
            rel_bias = table[index.reshape(-1)].reshape(
                n_tok, n_tok, self.heads).transpose(2, 0, 1)

        for i in range(self.depth):
            x = Block(self.dim, self.heads, mlp_ratio=self.mlp_ratio,
                      layer_scale=self.layer_scale,
                      dtype=self.dtype, name=f"block_{i}")(x, rel_bias)
        if self.final_norm:
            x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm")(x)
        return x


def _relative_position_index(side: int) -> jnp.ndarray:
    """BEiT relative-position index over (1 cls + side*side patch) tokens."""
    import numpy as np
    coords = np.stack(np.meshgrid(np.arange(side), np.arange(side),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]          # (2, P, P)
    rel = rel.transpose(1, 2, 0) + (side - 1)
    idx = rel[..., 0] * (2 * side - 1) + rel[..., 1]
    n = side * side
    full = np.zeros((n + 1, n + 1), dtype=np.int32)
    full[1:, 1:] = idx
    full[0, :] = (2 * side - 1) ** 2       # cls-to-token
    full[:, 0] = (2 * side - 1) ** 2 + 1   # token-to-cls
    full[0, 0] = (2 * side - 1) ** 2 + 2   # cls-to-cls
    return jnp.asarray(full)


def build_vit(variant: str, image_size: int = 224, dtype=jnp.float32,
              name: str = "backbone") -> ViT:
    preset = dict(VIT_PRESETS[variant])
    return ViT(image_size=image_size, dtype=dtype, name=name, **preset)
