"""Shared helpers for the Pallas TPU kernels."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def interpret_default() -> bool:
    """Run kernels in interpreter mode when not on TPU (CPU tests, debugging)."""
    return jax.default_backend() != "tpu"


def argmin_first(d: jnp.ndarray, axis: int = -1):
    """(values, indices) of the minimum along `axis`, first occurrence on ties.

    Matches the tie-breaking of a stable argsort (the reference's topk,
    pointnet2_utils.py:190-203) — important when resample-with-replacement
    duplicates points. Implemented with 2D iota (TPU requires >=2D).
    """
    axis = axis % d.ndim
    m = jnp.min(d, axis=axis, keepdims=True)
    pos = jax.lax.broadcasted_iota(jnp.int32, d.shape, axis)
    candidates = jnp.where(d == m, pos, d.shape[axis])
    idx = jnp.min(candidates, axis=axis)
    return jnp.squeeze(m, axis), idx.astype(jnp.int32)


def argmax_first(d: jnp.ndarray, axis: int = -1):
    """(values, indices) of the maximum along `axis`, first occurrence on ties."""
    axis = axis % d.ndim
    m = jnp.max(d, axis=axis, keepdims=True)
    pos = jax.lax.broadcasted_iota(jnp.int32, d.shape, axis)
    candidates = jnp.where(d == m, pos, d.shape[axis])
    idx = jnp.min(candidates, axis=axis)
    return jnp.squeeze(m, axis), idx.astype(jnp.int32)
