"""Classic PointNet backbone with input/feature spatial transformer networks.

Behavioral rebuild of mmdet3d/models/pointnet.py (STN3d:10-45, STNkd:48-85,
PointNetEncoder:88-127, PointNet:139-150). Channel-last: pts (B, N, C).
Output: (xyz (B, N, C_in), per-point feats (B, N, 1024)).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBNReLU


class STN(nn.Module):
    """Spatial transformer predicting a (k x k) alignment matrix (identity-init via
    residual add of eye, as in the reference)."""

    k: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        # x: (B, N, k)
        h = ConvBNReLU(64, dtype=self.dtype, name="conv1")(x, train=train)
        h = ConvBNReLU(128, dtype=self.dtype, name="conv2")(h, train=train)
        h = ConvBNReLU(1024, dtype=self.dtype, name="conv3")(h, train=train)
        h = jnp.max(h, axis=1)                                  # (B, 1024)
        h = ConvBNReLU(512, dtype=self.dtype, name="fc1")(h, train=train)
        h = ConvBNReLU(256, dtype=self.dtype, name="fc2")(h, train=train)
        h = nn.Dense(self.k * self.k, dtype=self.dtype, name="fc3")(h)
        eye = jnp.eye(self.k, dtype=h.dtype).reshape(1, -1)
        return (h + eye).reshape(-1, self.k, self.k)


class PointNetEncoder(nn.Module):
    """STN -> conv1(64) -> [optional feature STN] -> conv2(128) -> conv3(1024)."""

    feature_transform: bool = True
    channel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts: jnp.ndarray, train: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # pts: (B, N, C) with xyz first
        trans = STN(k=3, dtype=self.dtype, name="stn")(pts[..., :3], train=train)
        x = jnp.matmul(pts[..., :3], trans)
        if pts.shape[-1] > 3:
            x = jnp.concatenate([x, pts[..., 3:]], axis=-1)
        x = ConvBNReLU(64, dtype=self.dtype, name="conv1")(x, train=train)
        if self.feature_transform:
            ftrans = STN(k=64, dtype=self.dtype, name="fstn")(x, train=train)
            x = jnp.matmul(x, ftrans)
        x = ConvBNReLU(128, dtype=self.dtype, name="conv2")(x, train=train)
        # final conv has BN but no ReLU (reference pointnet.py:126)
        x = nn.Dense(1024, dtype=self.dtype, name="conv3")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn3")(x)
        return pts, x


class PointNetBackbone(nn.Module):
    """Wrapper matching the ReIDNet backbone interface: (pts, numpoints) ->
    (xyz, per-point feats). `numpoints` is accepted for interface parity and unused
    (reference PointNet.forward:148-150)."""

    channel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts: jnp.ndarray, numpoints: Sequence[int] = (),
                 train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return PointNetEncoder(feature_transform=True, channel=self.channel,
                               dtype=self.dtype, name="feat")(pts, train=train)


def feature_transform_regularizer(trans: jnp.ndarray) -> jnp.ndarray:
    """||I - T T^t||_F mean — orthogonality regularizer (pointnet.py:130-136)."""
    d = trans.shape[1]
    eye = jnp.eye(d, dtype=trans.dtype)[None]
    diff = jnp.matmul(trans, jnp.swapaxes(trans, 1, 2)) - eye
    return jnp.mean(jnp.linalg.norm(diff, axis=(1, 2)))
