"""Vector-Neuron (VN) layers and the VN-DGCNN point backbone.

Behavioral rebuild of the reference's rotation-equivariant encoder family
(mmdet3d/models/trackers/deprecated/vn_layers.py:12-198 and
vn_dgcnn_cls.py:20-91, graph features from dgcnn_utils.py:14-50). In the
reference these are dead code — every import is commented out
(trackers/__init__.py:1-26); here they are a live, registered backbone
(`build_backbone(type='vn_dgcnn')`) so the capability is actually reachable.

Vector-neuron features lift each scalar channel to an R^3 vector so every
layer commutes with global rotations. TPU-native layout: the vector axis
sits BEFORE the channel axis — `(B, N, 3, C)` per-point, `(B, N, K, 3, C)`
grouped — so channel mixing is a plain `nn.Dense` on the trailing axis
(one MXU matmul, no transposes; the reference pays two `.transpose(1,-1)`
copies per layer for the same contraction). All reductions over the vector
axis are axis=-2.

EPS placement, the LeakyReLU reflection formula, BN-on-norm semantics, and
the std-feature einsum orders follow the reference exactly (validated by
golden tests against the actual torch modules in tests/test_alt_encoders.py).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

import jax

from ..ops.geometry import index_points, knn_feature_space

EPS = 1e-6


def vn_graph_feature(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Dynamic-graph edge features on vector-neuron maps.

    Args:
        x: (B, N, 3, C) vector features.
    Returns:
        (B, N, k, 3, 2C): [neighbor - center || center] on the channel axis
        (dgcnn_utils.py:23-50; kNN in flattened 3C feature space, top-k on
        negative squared distance like torch.topk).
    """
    B, N = x.shape[0], x.shape[1]
    flat = x.reshape(B, N, -1)                                  # (B, N, 3C)
    idx = knn_feature_space(jnp.swapaxes(flat, -1, -2), k)      # (B, N, k)
    neigh = index_points(flat, idx)
    neigh = neigh.reshape(B, N, k, *x.shape[2:])                # (B, N, k, 3, C)
    center = jnp.broadcast_to(x[:, :, None], neigh.shape)
    return jnp.concatenate([neigh - center, center], axis=-1)   # (B, N, k, 3, 2C)


class VNLinear(nn.Module):
    """Channel-mixing map, equivariant because it never touches the vector axis
    (vn_layers.py:12-22)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                        name="map_to_feat")(x)


class VNBatchNorm(nn.Module):
    """BatchNorm on vector NORMS only — directions pass through untouched
    (vn_layers.py:107-127): x <- x / (|x| + EPS) * BN(|x|)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        norm = jnp.linalg.norm(x, axis=-2) + EPS                # (..., C)
        norm_bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=self.dtype, name="bn")(norm)
        return x / norm[..., None, :] * norm_bn[..., None, :]


def _vn_leaky(p: jnp.ndarray, d: jnp.ndarray, negative_slope: float) -> jnp.ndarray:
    """The VN LeakyReLU reflection: keep p where <p,d> >= 0, else remove the
    d-component; blend with slope (vn_layers.py:38-43, 69-73)."""
    dot = jnp.sum(p * d, axis=-2, keepdims=True)
    d_norm_sq = jnp.sum(d * d, axis=-2, keepdims=True)
    neg = p - (dot / (d_norm_sq + EPS)) * d
    kept = jnp.where(dot >= 0, p, neg)
    return negative_slope * p + (1.0 - negative_slope) * kept


class VNLeakyReLU(nn.Module):
    """vn_layers.py:25-43."""

    share_nonlinearity: bool = False
    negative_slope: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = 1 if self.share_nonlinearity else x.shape[-1]
        d = nn.Dense(out, use_bias=False, dtype=self.dtype, name="map_to_dir")(x)
        return _vn_leaky(x, d, self.negative_slope)


class VNLinearLeakyReLU(nn.Module):
    """Linear -> BN-on-norm -> directional LeakyReLU; the direction is computed
    from the INPUT, not the post-BN features (vn_layers.py:46-74)."""

    features: int
    share_nonlinearity: bool = False
    negative_slope: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        p = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                     name="map_to_feat")(x)
        p = VNBatchNorm(dtype=self.dtype, name="batchnorm")(p, train=train)
        out = 1 if self.share_nonlinearity else self.features
        d = nn.Dense(out, use_bias=False, dtype=self.dtype, name="map_to_dir")(x)
        return _vn_leaky(p, d, self.negative_slope)


class VNMaxPool(nn.Module):
    """Max pool over the sample axis by a learned direction's dot product
    (vn_layers.py:130-144). Input (B, N, K, 3, C) -> (B, N, 3, C)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = nn.Dense(x.shape[-1], use_bias=False, dtype=self.dtype,
                     name="map_to_dir")(x)
        dot = jnp.sum(x * d, axis=-2)                           # (B, N, K, C)
        idx = jnp.argmax(dot, axis=-2)                          # (B, N, C)
        sel = jnp.take_along_axis(x, idx[:, :, None, None, :], axis=-3)
        return jnp.squeeze(sel, axis=-3)                        # (B, N, 3, C)


def vn_mean_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over the sample axis (vn_layers.py:147-148)."""
    return jnp.mean(x, axis=-3)


class VNStdFeature(nn.Module):
    """Rotation-INVARIANT readout: learn a 3-frame z0 from the features and
    express every vector in it (vn_layers.py:151-198, dim=4 path).

    Input (B, N, 3, C) -> (invariant (B, N, C, 3), frame z0 (B, N, 3, 3)).
    The trailing (C, 3) pair flattens C-major, matching the reference's
    `x.view(B, -1, N)` of a (B, C, 3, N) tensor.
    """

    normalize_frame: bool = False
    share_nonlinearity: bool = False
    negative_slope: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = x.shape[-1]
        z0 = VNLinearLeakyReLU(c // 2, self.share_nonlinearity,
                               self.negative_slope, dtype=self.dtype,
                               name="vn1")(x, train=train)
        z0 = VNLinearLeakyReLU(c // 4, self.share_nonlinearity,
                               self.negative_slope, dtype=self.dtype,
                               name="vn2")(z0, train=train)
        kout = 2 if self.normalize_frame else 3
        z0 = nn.Dense(kout, use_bias=False, dtype=self.dtype,
                      name="vn_lin")(z0)                        # (B, N, 3, kout)
        if self.normalize_frame:
            # Gram-Schmidt the two learned axes, third = cross product
            # (vn_layers.py:173-187). Channel k indexes the axes.
            v1 = z0[..., 0]                                     # (B, N, 3)
            u1 = v1 / (jnp.linalg.norm(v1, axis=-1, keepdims=True) + EPS)
            v2 = z0[..., 1]
            v2 = v2 - jnp.sum(v2 * u1, axis=-1, keepdims=True) * u1
            u2 = v2 / (jnp.linalg.norm(v2, axis=-1, keepdims=True) + EPS)
            u3 = jnp.cross(u1, u2)
            z0 = jnp.stack([u1, u2, u3], axis=-1)               # (B, N, 3, 3)
        # x_std[..., i, k] = sum_j x[..., j, i] * z0[..., j, k]
        x_std = jnp.einsum("...ji,...jk->...ik", x, z0)
        return x_std, z0


class VNDGCNNBackbone(nn.Module):
    """VN-DGCNN per-point encoder (vn_dgcnn_cls.py:20-91).

    4 VN edge-conv blocks with directional pooling -> width-341 fuse ->
    mean-context concat -> std-feature invariant readout. forward matches the
    framework backbone protocol: (pts (B,N,3), numpoints) ->
    (xyz (B,N,3), feats (B, N, (1024//3)*2*3 = 2046)).
    """

    n_knn: int = 20
    pooling: str = "max"            # 'max' | 'mean'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts: jnp.ndarray, numpoints: Sequence[int] = (),
                 train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        def pool(name):
            if self.pooling == "max":
                return VNMaxPool(dtype=self.dtype, name=name)
            return lambda g: vn_mean_pool(g)

        x = pts[:, :, :, None]                                  # (B, N, 3, 1)
        g = vn_graph_feature(x, self.n_knn)                     # (B, N, k, 3, 2)
        g = VNLinearLeakyReLU(64 // 3, dtype=self.dtype, name="conv1")(g, train=train)
        x1 = pool("pool1")(g)
        g = vn_graph_feature(x1, self.n_knn)
        g = VNLinearLeakyReLU(64 // 3, dtype=self.dtype, name="conv2")(g, train=train)
        x2 = pool("pool2")(g)
        g = vn_graph_feature(x2, self.n_knn)
        g = VNLinearLeakyReLU(128 // 3, dtype=self.dtype, name="conv3")(g, train=train)
        x3 = pool("pool3")(g)
        g = vn_graph_feature(x3, self.n_knn)
        g = VNLinearLeakyReLU(256 // 3, dtype=self.dtype, name="conv4")(g, train=train)
        x4 = pool("pool4")(g)

        x = jnp.concatenate([x1, x2, x3, x4], axis=-1)          # (B, N, 3, 169)
        x = VNLinearLeakyReLU(1024 // 3, share_nonlinearity=True,
                              dtype=self.dtype, name="conv5")(x, train=train)
        x_mean = jnp.broadcast_to(jnp.mean(x, axis=1, keepdims=True), x.shape)
        x = jnp.concatenate([x, x_mean], axis=-1)               # (B, N, 3, 682)
        x, _ = VNStdFeature(dtype=self.dtype, name="std_feature")(x, train=train)
        B, N = x.shape[0], x.shape[1]
        return pts, x.reshape(B, N, -1)                         # (B, N, 2046)
