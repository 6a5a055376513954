"""Fused linear-attention Pallas kernel with custom VJP.

TPU-native fusion of the linear-attention inner loop ("Transformers are
RNNs"; reference mmdet3d/models/pointnet2_utils.py:14-47 /
mmdet3d/models/attention.py:20-53): elu+1 feature map, KV summary matmul,
eps-regularized normalizer, and output contraction execute in one
VMEM-resident program per (batch, head) — the XLA path materializes the
feature-mapped Q/K and the (H, D, V) KV tensor in HBM between fusions.

Numerics are identical to `ops.attention.linear_attention` (including the
1/v_length pre-scale kept for checkpoint parity); the backward pass
recomputes through the XLA composite (cheap: O(N d^2) with tiny d), so the
kernel is safe to use in training.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import interpret_default
from ..attention import linear_attention as _linear_attention_xla


def _elu1(x):
    # elu(x) + 1 without expm1 (unimplemented in Mosaic TC lowering)
    return jnp.where(x > 0, x + 1.0, jnp.exp(jnp.minimum(x, 0.0)))


def _lin_attn_kernel(q_ref, k_ref, v_ref, out_ref, *, eps: float):
    """One (batch, head): q (L, D), k (S, D), v (S, V) -> out (L, V)."""
    Q = _elu1(q_ref[...])
    K = _elu1(k_ref[...])
    V = v_ref[...]
    v_length = V.shape[0]
    V = V / v_length                       # fp16-era rescale, numerical parity
    # contract over S without explicit transposes (Mosaic-friendly)
    KV = jax.lax.dot_general(K, V, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (D, V)
    Ksum = jnp.sum(K, axis=0, keepdims=True)                      # (1, D)
    Z = 1.0 / (jnp.sum(Q * Ksum, axis=-1, keepdims=True) + eps)   # (L, 1)
    out_ref[...] = jnp.dot(Q, KV, preferred_element_type=jnp.float32) \
        * Z * v_length


def _forward(queries, keys, values, eps, interpret):
    B, L, H, D = queries.shape
    _, S, _, V = values.shape
    # (B, L, H, D) -> (B*H, L, D): one grid step per (batch, head); a single
    # flattened grid axis keeps the block specs to one squeezed dim (Mosaic
    # is touchy about multiple squeezed leading dims)
    q = jnp.transpose(queries, (0, 2, 1, 3)).reshape(B * H, L, D).astype(
        jnp.float32)
    k = jnp.transpose(keys, (0, 2, 1, 3)).reshape(B * H, S, D).astype(
        jnp.float32)
    v = jnp.transpose(values, (0, 2, 1, 3)).reshape(B * H, S, V).astype(
        jnp.float32)

    out = pl.pallas_call(
        functools.partial(_lin_attn_kernel, eps=eps),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((None, L, D), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, D), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, V), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, L, V), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, L, V), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (S * D * V + L * D * V + L * D),
            bytes_accessed=4 * B * H * (L * D + S * D + S * V + L * V),
            transcendentals=B * H * (L * D + S * D),
        ),
        interpret=interpret,
    )(q, k, v)
    out = out.reshape(B, H, L, V)
    return jnp.transpose(out, (0, 2, 1, 3)).astype(queries.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _lin_attn(queries, keys, values, eps, interpret):
    return _forward(queries, keys, values, eps, interpret)


def _lin_attn_fwd(queries, keys, values, eps, interpret):
    return _forward(queries, keys, values, eps, interpret), \
        (queries, keys, values)


def _lin_attn_bwd(eps, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _linear_attention_xla(q_, k_, v_, eps=eps), q, k, v)
    return vjp(g.astype(q.dtype))


_lin_attn.defvjp(_lin_attn_fwd, _lin_attn_bwd)


def linear_attention_pallas(queries: jnp.ndarray, keys: jnp.ndarray,
                            values: jnp.ndarray, eps: float = 1e-6,
                            interpret: bool | None = None) -> jnp.ndarray:
    """Drop-in for `ops.attention.linear_attention` (unmasked path).

    Args:
        queries: (B, L, H, D); keys: (B, S, H, D); values: (B, S, H, V).
    Returns:
        (B, L, H, V)
    """
    if interpret is None:
        interpret = interpret_default()
    return _lin_attn(queries, keys, values, eps, interpret)
