"""Linear attention primitive ("Transformers are RNNs", Katharopoulos et al. 2020).

Functional core shared by every attention block in the framework (self, cross, local,
image). Numerics match the reference implementation exactly — elu+1 feature map, the
1/v_length pre-scale (an fp16-overflow workaround that changes rounding and therefore
matters for checkpoint parity), and the eps-regularized normalizer.
(reference: mmdet3d/models/pointnet2_utils.py:14-47, mmdet3d/models/attention.py:20-53)

On TPU this is two MXU contractions of shape (D x S) @ (S x V) and (L x D) @ (D x V)
per head — O(N d^2) instead of O(N^2 d), which is why the reference scales to 2048
points without sequence parallelism (SURVEY.md §5.7).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def elu_feature_map(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.elu(x) + 1.0


def linear_attention(
    queries: jnp.ndarray,
    keys: jnp.ndarray,
    values: jnp.ndarray,
    q_mask: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Multi-head linear attention.

    Args:
        queries: (B, L, H, D)
        keys:    (B, S, H, D)
        values:  (B, S, H, V)
        q_mask:  (B, L) optional validity mask.
        kv_mask: (B, S) optional validity mask.
    Returns:
        (B, L, H, V)
    """
    Q = elu_feature_map(queries)
    K = elu_feature_map(keys)

    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None]
    if kv_mask is not None:
        K = K * kv_mask[:, :, None, None]
        values = values * kv_mask[:, :, None, None]

    v_length = values.shape[1]
    values = values / v_length  # fp16/bf16 overflow guard, kept for numerical parity
    KV = jnp.einsum("nshd,nshv->nhdv", K, values)
    Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
    out = jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_length
    return out


def full_attention(
    queries: jnp.ndarray,
    keys: jnp.ndarray,
    values: jnp.ndarray,
    q_mask: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Softmax attention fallback (reference attention.py:56-91, unused by released
    configs but part of the capability surface)."""
    QK = jnp.einsum("nlhd,nshd->nlsh", queries, keys)
    if q_mask is not None or kv_mask is not None:
        mask = jnp.ones(QK.shape[:3] + (1,), bool)
        if q_mask is not None:
            mask = mask & q_mask[:, :, None, None].astype(bool)
        if kv_mask is not None:
            mask = mask & kv_mask[:, None, :, None].astype(bool)
        QK = jnp.where(mask, QK, -jnp.inf)
    temp = 1.0 / jnp.sqrt(queries.shape[3])
    A = jax.nn.softmax(temp * QK, axis=2)
    A = jnp.nan_to_num(A)
    return jnp.einsum("nlsh,nshd->nlhd", A, values)
