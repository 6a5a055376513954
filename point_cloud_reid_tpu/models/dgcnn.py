"""DGCNN backbone: 4 EdgeConv blocks -> concat -> pointwise conv to emb_dims.

Behavioral rebuild of mmdet3d/models/dgcnn_orig.py:89-152 (per-point head variant;
the classifier head the reference keeps commented out is omitted). The reference's
hardcoded `device='cuda'` in get_graph_feature is a documented bug we do not carry.
Channel-last: input (B, N, 3) -> (xyz (B, N, 3), feats (B, N, emb_dims)).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import get_graph_feature


class EdgeConv(nn.Module):
    """[neighbor-center || center] -> pointwise conv + BN + LeakyReLU -> max over k."""

    features: int
    k: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        # x: (B, N, C); graph features channel-first helper -> transpose around it
        g = get_graph_feature(jnp.swapaxes(x, -1, -2), k=self.k)   # (B, 2C, N, k)
        g = jnp.transpose(g, (0, 2, 3, 1))                          # (B, N, k, 2C)
        g = nn.Dense(self.features, use_bias=False, dtype=self.dtype, name="conv")(g)
        g = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(g)
        g = nn.leaky_relu(g, negative_slope=0.2)
        return jnp.max(g, axis=2)                                   # (B, N, F)


class DGCNNBackbone(nn.Module):
    """forward(pts (B,N,3), numpoints unused) -> (xyz, (B,N,emb_dims))."""

    emb_dims: int = 1024
    k: int = 20
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts: jnp.ndarray, numpoints: Sequence[int] = (),
                 train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x1 = EdgeConv(64, self.k, dtype=self.dtype, name="conv1")(pts, train=train)
        x2 = EdgeConv(64, self.k, dtype=self.dtype, name="conv2")(x1, train=train)
        x3 = EdgeConv(128, self.k, dtype=self.dtype, name="conv3")(x2, train=train)
        x4 = EdgeConv(256, self.k, dtype=self.dtype, name="conv4")(x3, train=train)
        x = jnp.concatenate([x1, x2, x3, x4], axis=-1)              # (B, N, 512)
        x = nn.Dense(self.emb_dims, use_bias=False, dtype=self.dtype, name="conv5")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn5")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        return pts, x
