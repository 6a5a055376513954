"""Training-mode SA conv chain with a restructured autodiff residual policy.

STATUS: measured SLOWER end-to-end than the plain flax path — default OFF
(`SetAbstractionEdgeSA.fused_train=False`). Kept because the numerics are
fully pinned (tests/test_sa_train.py) and the measurements document why the
obvious "fuse the train chain" lever does not pay on this model:

  - flagship B=256 train step (tools/profile_train_table.py, v5e):
    flax path 184 ms / 124 GB @ 674 GB/s; this op with custom VJP
    219 ms / 116 GB @ 532 GB/s; same forward with plain autodiff
    215 ms / 107 GB @ 500 GB/s. The fused FORWARD alone is faster
    (62 vs 72 ms — fewer f32 materializations), but under grad the
    restructured backward runs at ~520 GB/s vs autodiff's ~640: the bytes
    it removes are cheap streaming passes, the ones it keeps (gathers,
    wgrad matmuls over (B,S,K,C)) are the expensive kind.
  - the decisive train-step lever was elsewhere: routing the SA1/SA2
    grouping gathers through the one-hot MXU contraction (raising
    index_points' selector budget to 1 GiB) cut the flax-path step to
    122 ms — XLA's native gather/scatter at those shapes runs 6-10x
    slower than the one-hot matmul (tools/profile_gather.py).

The SA stage's train-mode cost is HBM traffic on the grouped (B, S, K, C)
tensor chain (gather -> conv1 -> BN1 -> relu -> conv2 -> BN2 -> relu ->
conv3 -> BN3 -> relu -> max over k).  Under plain flax autodiff, XLA saves
most of that chain as backward residuals.

This module reimplements the chain as ONE `jax.custom_vjp` op with an
explicit checkpoint policy chosen from measured costs:

  forward residuals kept:  A (per-point conv1 factor), Ct (per-center term),
                           idx, h2, h3 (the pre-BN conv outputs, compute
                           dtype) and the tiny per-layer BN coefficients.
  recomputed in backward:  h1 (one gather — cheaper than a (B,S,K,C) HBM
                           round-trip at every released shape), every
                           elementwise value (xhat_l, relu masks, z_l), and
                           the max-over-k tie masks.
  never materialized:      grouped dxyz / edge tensors (the conv1 algebra is
                           the same per-point factoring as the eval kernel,
                           ops/pallas/sa_stage.py:17-29), normalized BN
                           outputs, autodiff's per-op residuals.

Train-mode BatchNorm backward is written algebraically with explicit
population sums (P = B*S*K, biased variance, matching flax's
`use_fast_variance` E[x^2]-E[x]^2 form):

    dx = gamma*r * (dy - S/P - xhat * T/P),  S = sum(dy), T = sum(dy*xhat)
    dgamma = T, dbeta = S,  r = rsqrt(var + eps)

Tie semantics match JAX autodiff exactly: max-over-k splits the cotangent
evenly among tied argmax slots (lax reduce_max JVP), and relu uses
jax.nn.relu's custom-JVP convention (derivative 0 at exactly 0).

Reference semantics: pointnet2_utils.py:242-360 (sample_and_group_edge +
PointNetSetAbstractionEdgeSA conv/max chain) in train mode; numerics mirror
flax ConvBNReLU (models/layers.py:102-130, momentum 0.9, eps 1e-5).
Equality with the unfused path is pinned by tests/test_sa_train.py (outputs,
batch stats, and gradients for every input and parameter).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import index_points

Array = jnp.ndarray


def _pop_stats(h: Array) -> Tuple[Array, Array]:
    """Per-channel population mean/var over (B, S, K), f32, biased variance."""
    h32 = h.astype(jnp.float32)
    mean = jnp.mean(h32, axis=(0, 1, 2))
    mean2 = jnp.mean(jnp.square(h32), axis=(0, 1, 2))
    var = mean2 - jnp.square(mean)
    return mean, var


def _bn_coeffs(gamma: Array, beta: Array, mean: Array, var: Array, eps: float):
    """Fold batch stats into an affine y = a*h + c (f32); also return m, r."""
    r = jax.lax.rsqrt(var + jnp.float32(eps))
    a = gamma.astype(jnp.float32) * r
    c = beta.astype(jnp.float32) - mean * a
    return a, c, mean, r


def _gather_grouped(points: Array, idx: Array) -> Array:
    """(B, N, C) gathered to (B, S, K, C); index_points' auto policy.

    A chunked one-hot contraction (selector split over S, lax.scan) was tried
    here to keep oversized selectors on the MXU; measured on TPU it was a
    regression at the flagship train shapes — forward +14 ms / +1.4 TFLOP /
    +9 GB, full step 251 vs 184 ms — because lax.scan blocks fusion and the
    stack/transpose copies dominate. index_points' auto policy (one-hot MXU
    contraction in <=1 GiB selector slices via UNROLLED K-splits, native
    gather only beyond that) is the measured best at every released shape.
    """
    return index_points(points, idx)


def _gather_h1(A: Array, Ct: Array, idx: Array) -> Array:
    """h1 = conv1(edge) via the per-point factoring: gather(A) + Ct."""
    return _gather_grouped(A, idx) + Ct[:, :, None, :]


def _fwd_impl(cfg, A, Ct, idx, w2, b2, w3, b3, g1, be1, g2, be2, g3, be3):
    eps, dtname = cfg
    dt = jnp.dtype(dtname)
    f32 = jnp.float32

    h1 = _gather_h1(A, Ct, idx)                              # (B,S,K,C) dt
    m1, v1 = _pop_stats(h1)
    a1, c1, _, _ = _bn_coeffs(g1, be1, m1, v1, eps)
    z1 = jax.nn.relu(h1.astype(f32) * a1 + c1).astype(dt)

    h2 = (jnp.dot(z1, w2.astype(dt)) + b2.astype(dt)).astype(dt)
    m2, v2 = _pop_stats(h2)
    a2, c2, _, _ = _bn_coeffs(g2, be2, m2, v2, eps)
    z2 = jax.nn.relu(h2.astype(f32) * a2 + c2).astype(dt)

    h3 = (jnp.dot(z2, w3.astype(dt)) + b3.astype(dt)).astype(dt)
    m3, v3 = _pop_stats(h3)
    a3, c3, _, _ = _bn_coeffs(g3, be3, m3, v3, eps)
    z3 = jax.nn.relu(h3.astype(f32) * a3 + c3).astype(dt)

    out = jnp.max(z3, axis=2)                                # (B,S,C) dt
    stats = ((m1, v1), (m2, v2), (m3, v3))
    return out, stats, (h2, h3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def sa_train_pooled(cfg, A, Ct, idx, w2, b2, w3, b3,
                    g1, be1, g2, be2, g3, be3):
    """Fused-residual train-mode SA chain.

    Args:
        cfg: static (eps, compute_dtype_name) pair.
        A: (B, N, C) per-point conv1 factor (xyz @ W_d [+ points @ W_g]).
        Ct: (B, S, C) per-center conv1 term (center/bias parts).
        idx: (B, S, K) int32 neighbor indices into N.
        w2/b2, w3/b3: conv2/conv3 kernels (C, C) and biases (C,).
        g*/be*: BatchNorm scale/bias per layer (f32).
    Returns:
        out: (B, S, C) pooled stage features (pre self-attention).
        stats: ((mean, var),) * 3 batch statistics per BN layer (f32) for the
            running-stat update; treated as non-differentiable outputs.
    """
    out, stats, _ = _fwd_impl(cfg, A, Ct, idx, w2, b2, w3, b3,
                              g1, be1, g2, be2, g3, be3)
    return out, stats


def _fwd_rule(cfg, A, Ct, idx, w2, b2, w3, b3, g1, be1, g2, be2, g3, be3):
    eps, _ = cfg
    out, stats, (h2, h3) = _fwd_impl(cfg, A, Ct, idx, w2, b2, w3, b3,
                                     g1, be1, g2, be2, g3, be3)
    (m1, v1), (m2, v2), (m3, v3) = stats
    coeffs = (_bn_coeffs(g1, be1, m1, v1, eps),
              _bn_coeffs(g2, be2, m2, v2, eps),
              _bn_coeffs(g3, be3, m3, v3, eps))
    bn_params = (g1, be1, g2, be2, g3, be3)
    res = (A, Ct, idx, w2, b2, w3, b3, h2, h3, out, coeffs, bn_params)
    return (out, stats), res


def _bwd_rule(cfg, res, cot):
    _, dtname = cfg
    dt = jnp.dtype(dtname)
    f32 = jnp.float32
    A, Ct, idx, w2, b2, w3, b3, h2, h3, out, coeffs, bn_params = res
    g1, be1, g2, be2, g3, be3 = bn_params
    (a1, c1, m1, r1), (a2, c2, m2, r2), (a3, c3, m3, r3) = coeffs
    dout = cot[0].astype(f32)                                # (B,S,C)
    B, S, K = idx.shape
    P = f32(B * S * K)

    def bn_bwd(dy, h32, a, m, r):
        """dy at BN output -> (dh, dgamma, dbeta); population sums explicit."""
        xhat = (h32 - m) * r
        Ssum = jnp.sum(dy, axis=(0, 1, 2))
        Tsum = jnp.sum(dy * xhat, axis=(0, 1, 2))
        dh = a * (dy - Ssum / P - xhat * (Tsum / P))
        return dh, Tsum, Ssum

    def wgrad(zin, dh):
        """dW = z^T dh over the population; f32 accumulation on the MXU."""
        return jax.lax.dot_general(
            zin.reshape(-1, zin.shape[-1]), dh.astype(dt).reshape(-1, dh.shape[-1]),
            (((0,), (0,)), ((), ())), preferred_element_type=f32)

    # ---- layer 3: max-over-k scatter (even tie split) + relu + BN ----------
    h3_32 = h3.astype(f32)
    y3 = h3_32 * a3 + c3
    z3 = jnp.maximum(y3, 0.0).astype(dt)
    eq = (z3 == out[:, :, None, :])
    cnt = jnp.sum(eq, axis=2, keepdims=True).astype(f32)
    dz3 = jnp.where(eq, dout[:, :, None, :] / cnt, 0.0)
    dy3 = dz3 * (y3 > 0)
    dh3, dg3, dbe3 = bn_bwd(dy3, h3_32, a3, m3, r3)
    h2_32 = h2.astype(f32)
    y2 = h2_32 * a2 + c2
    z2 = jnp.maximum(y2, 0.0).astype(dt)
    dW3 = wgrad(z2, dh3)
    db3 = jnp.sum(dh3, axis=(0, 1, 2))
    dz2 = jnp.dot(dh3.astype(dt), w3.astype(dt).T,
                  preferred_element_type=f32)

    # ---- layer 2 -----------------------------------------------------------
    dy2 = dz2 * (y2 > 0)
    dh2, dg2, dbe2 = bn_bwd(dy2, h2_32, a2, m2, r2)
    h1 = _gather_h1(A, Ct, idx)                              # recompute: 1 gather
    h1_32 = h1.astype(f32)
    y1 = h1_32 * a1 + c1
    z1 = jnp.maximum(y1, 0.0).astype(dt)
    dW2 = wgrad(z1, dh2)
    db2 = jnp.sum(dh2, axis=(0, 1, 2))
    dz1 = jnp.dot(dh2.astype(dt), w2.astype(dt).T,
                  preferred_element_type=f32)

    # ---- layer 1 -> conv1 factors ------------------------------------------
    dy1 = dz1 * (y1 > 0)
    dh1, dg1, dbe1 = bn_bwd(dy1, h1_32, a1, m1, r1)
    dh1 = dh1.astype(dt)
    _, gather_vjp = jax.vjp(lambda a: _gather_grouped(a, idx), A)
    dA, = gather_vjp(dh1)
    dCt = jnp.sum(dh1, axis=2).astype(Ct.dtype)

    didx = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return (dA.astype(A.dtype), dCt, didx,
            dW2.astype(w2.dtype), db2.astype(b2.dtype),
            dW3.astype(w3.dtype), db3.astype(b3.dtype),
            dg1.astype(g1.dtype), dbe1.astype(be1.dtype),
            dg2.astype(g2.dtype), dbe2.astype(be2.dtype),
            dg3.astype(g3.dtype), dbe3.astype(be3.dtype))


sa_train_pooled.defvjp(_fwd_rule, _bwd_rule)


def sa_train_reference(cfg, A, Ct, idx, w2, b2, w3, b3,
                       g1, be1, g2, be2, g3, be3):
    """Same math WITHOUT the custom VJP (plain autodiff) — test oracle."""
    out, stats, _ = _fwd_impl(cfg, A, Ct, idx, w2, b2, w3, b3,
                              g1, be1, g2, be2, g3, be3)
    return out, stats
