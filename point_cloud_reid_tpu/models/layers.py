"""Shared flax building blocks.

Channel-last convention: every point-feature tensor is (B, N, C) — the natural TPU
layout (C rides the 128-lane dimension, pointwise convs become Dense matmuls on the
MXU). The reference's channel-first (B, C, N) interfaces map 1:1 by a transpose at
the framework boundary.

Blocks mirror the reference's head components (mmdet3d/models/lanegcn_nets.py):
LinearRes (lanegcn_nets.py:193), PostRes (:91), Conv/Conv1d/Linear norm blocks.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


def gcd(a: int, b: int) -> int:
    return math.gcd(a, b)


class LinearRes(nn.Module):
    """Linear residual block with GroupNorm — the standard match-head block.

    y = relu( GN(W2 relu(GN(W1 x))) + T(x) ), biasless linears.
    (reference: lanegcn_nets.py:193-241)
    """

    n_in: int
    n_out: int
    norm: str = "GN"
    ng: int = 32
    activation: str = "ReLU"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        act = nn.relu if self.activation == "ReLU" else nn.gelu

        def make_norm(name):
            if self.norm == "GN":
                return nn.GroupNorm(num_groups=gcd(self.ng, self.n_out), epsilon=1e-5, name=name,
                                    dtype=self.dtype)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name, dtype=self.dtype)

        out = nn.Dense(self.n_out, use_bias=False, name="linear1", dtype=self.dtype)(x)
        out = make_norm("norm1")(out)
        out = act(out)
        out = nn.Dense(self.n_out, use_bias=False, name="linear2", dtype=self.dtype)(out)
        out = make_norm("norm2")(out)

        if self.n_in != self.n_out:
            sc = nn.Dense(self.n_out, use_bias=False, name="transform_linear",
                          dtype=self.dtype)(x)
            sc = make_norm("transform_norm")(sc)
            out = out + sc
        else:
            out = out + x
        return act(out)


class MLP(nn.Module):
    """Dense stack with activation between layers (optionally after the last)."""

    features: Sequence[int]
    activation: Callable = nn.relu
    use_bias: bool = True
    activate_final: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=self.use_bias, dtype=self.dtype,
                         name=f"dense_{i}")(x)
            if i < len(self.features) - 1 or self.activate_final:
                x = self.activation(x)
        return x


class PosMLP(nn.Module):
    """Positional encoder: Dense(3->d) -> ReLU -> Dense(d->out).

    (reference: Self_Attention.pos_mlp, pointnet2_utils.py:66-70)
    """

    d_model: int
    d_out: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz: jnp.ndarray) -> jnp.ndarray:
        out = self.d_out if self.d_out is not None else self.d_model
        h = nn.Dense(self.d_model, dtype=self.dtype, name="fc1")(xyz)
        h = nn.relu(h)
        return nn.Dense(out, dtype=self.dtype, name="fc2")(h)


class ConvBNReLU(nn.Module):
    """Pointwise conv (= Dense over last axis) + BatchNorm + ReLU.

    Works on (B, ..., C); BN normalizes each channel over all leading axes — under
    SPMD jit with a batch-sharded input this mean/var is the GLOBAL batch statistic,
    i.e. SyncBN (reference ops/norm.py NaiveSyncBatchNorm) for free.

    setup-based so callers can split the conv algebraically (the SA stages'
    edge-feature path factors the kernel into per-input-block matmuls,
    SetAbstractionEdgeSA) and then apply `norm_act` on the assembled output;
    param names ('conv', 'bn') are unchanged.
    """

    features: int
    dtype: Any = jnp.float32
    use_bias: bool = True

    def setup(self):
        self.conv = nn.Dense(self.features, use_bias=self.use_bias,
                             dtype=self.dtype)
        self.bn = nn.BatchNorm(use_running_average=None, momentum=0.9,
                               epsilon=1e-5, dtype=self.dtype)

    def norm_act(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = self.bn(x, use_running_average=not train)
        return nn.relu(x)

    def update_stats(self, mean: jnp.ndarray, var: jnp.ndarray) -> None:
        """Running-stat update for fused paths that bypass `self.bn.__call__`
        (the fused SA train chain computes batch mean/var itself). Mirrors
        flax BatchNorm exactly: ra = momentum*ra + (1-momentum)*batch, with
        the same zeros/ones initialization when the variables don't exist
        yet (params-only apply), and the same error on an immutable
        batch_stats collection (put_variable raises, as flax BN would).
        """
        m = self.bn.momentum
        ra_mean = (self.bn.get_variable("batch_stats", "mean")
                   if self.bn.has_variable("batch_stats", "mean")
                   else jnp.zeros_like(mean))
        ra_var = (self.bn.get_variable("batch_stats", "var")
                  if self.bn.has_variable("batch_stats", "var")
                  else jnp.ones_like(var))
        self.bn.put_variable("batch_stats", "mean",
                             m * ra_mean + (1 - m) * mean)
        self.bn.put_variable("batch_stats", "var",
                             m * ra_var + (1 - m) * var)

    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        return self.norm_act(self.conv(x), train=train)


class LinearGN(nn.Module):
    """Biasless Dense + GroupNorm + optional ReLU (lanegcn Linear block)."""

    n_out: int
    ng: int = 32
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.n_out, use_bias=False, dtype=self.dtype, name="linear")(x)
        x = nn.GroupNorm(num_groups=gcd(self.ng, self.n_out), epsilon=1e-5, dtype=self.dtype,
                         name="norm")(x)
        return nn.relu(x) if self.act else x


class PostRes(nn.Module):
    """3x3 conv residual block (NHWC), lanegcn_nets.py:91-139."""

    n_out: int
    stride: int = 1
    norm: str = "GN"
    ng: int = 32
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        n_in = x.shape[-1]

        def make_norm(name):
            if self.norm == "GN":
                return nn.GroupNorm(num_groups=gcd(self.ng, self.n_out), epsilon=1e-5, name=name,
                                    dtype=self.dtype)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name, dtype=self.dtype)

        out = nn.Conv(self.n_out, (3, 3), strides=self.stride, use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = make_norm("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.n_out, (3, 3), use_bias=False, dtype=self.dtype,
                      name="conv2")(out)
        out = make_norm("bn2")(out)
        if self.stride != 1 or n_in != self.n_out:
            x = nn.Conv(self.n_out, (1, 1), strides=self.stride, use_bias=False,
                        dtype=self.dtype, name="downsample_conv")(x)
            x = make_norm("downsample_norm")(x)
        out = out + x
        return nn.relu(out) if self.act else out


class Res1d(nn.Module):
    """1-D conv residual block (B, L, C), lanegcn_nets.py:142-191.

    Same structure as PostRes with kernel_size-k 1-D convs; 'same' padding
    via (k-1)//2, GN or BN norms, optional final activation.
    """

    n_out: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = "GN"
    ng: int = 32
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        n_in = x.shape[-1]
        pad = (self.kernel_size - 1) // 2

        def make_norm(name):
            if self.norm == "GN":
                return nn.GroupNorm(num_groups=gcd(self.ng, self.n_out),
                                    epsilon=1e-5, name=name, dtype=self.dtype)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name, dtype=self.dtype)

        out = nn.Conv(self.n_out, (self.kernel_size,), strides=(self.stride,),
                      padding=[(pad, pad)], use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = make_norm("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.n_out, (self.kernel_size,), padding=[(pad, pad)],
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = make_norm("bn2")(out)
        if self.stride != 1 or n_in != self.n_out:
            x = nn.Conv(self.n_out, (1,), strides=(self.stride,), use_bias=False,
                        dtype=self.dtype, name="downsample_conv")(x)
            x = make_norm("downsample_norm")(x)
        out = out + x
        return nn.relu(out) if self.act else out


def max_pool_points(h: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) -> (B, C) max over points."""
    return jnp.max(h, axis=1)


def avg_pool_points(h: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) -> (B, C) mean over points."""
    return jnp.mean(h, axis=1)


def pooled_feats(h: jnp.ndarray, pool_type: str) -> jnp.ndarray:
    """Pool per-point features to a vector (reference get_pooled_feats,
    ReIDNet.py:526-534). 'max' -> (B, C); 'both' -> (B, 2C) [max || avg]."""
    if pool_type == "max":
        return max_pool_points(h)
    if pool_type == "both":
        return jnp.concatenate([max_pool_points(h), avg_pool_points(h)], axis=-1)
    raise NotImplementedError(pool_type)
