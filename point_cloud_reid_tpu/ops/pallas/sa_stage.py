"""Fused SA-stage kernel: gather + edge-MLP + max-over-k in VMEM.

The XLA SA stage materializes the grouped tensor chain in HBM — at flagship
widths (B=128 crops, SA2: (128, 64, 48, 256)) each conv round-trips ~200 MB,
and the measured embed runs at ~450 GB/s with its compute at ~55% of the
empirical matmul roof. Per crop, everything is tiny: the crop features are
(128, C) (<= 128 KB), the grouped rows (S*K, C) fit VMEM at every released
shape. This kernel runs the whole per-crop chain

    one-hot gather -> +center terms -> BN1+relu -> conv2 BN2 relu
                   -> conv3 BN3 relu -> max over k

in VMEM; HBM traffic collapses to the per-crop (N, C) inputs and the (S, C)
stage output. Eval-mode only (BN folded to per-channel affine); training
keeps the XLA path, whose autodiff covers the backward.

Algebra (the edge_split factoring, models/point_transformer.py:88-119, taken
one step further so the gather itself is an MXU one-hot contraction inside
the kernel):

    conv1(edge) = OH @ A + Ct   where  A  = xyz @ W_d + points @ W_g   (N, C)
                                       Ct = center @ (W_c - W_g)
                                            - new_xyz @ W_d + b1       (S, C)

Row layout is k-major (row = k*S + s) so max-over-k reduces K contiguous
(S, C) blocks — no strided access. The neighbor index arrives as
(B, K*S, 1) int32; the one-hot is built in-kernel with a broadcasted iota
compare (a (KS, 1) operand needs the trailing singleton to satisfy Mosaic's
2D rule, like match_grid's (n, 1, C) vectors).

Reference semantics: pointnet2_utils.py:242-360 (sample_and_group_edge +
PointNetSetAbstractionEdgeSA conv/max chain).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import conv1_edge_factors


def _kernel(a_ref, ct_ref, idx_ref, w2_ref, w3_ref,
            s1_ref, t1_ref, s2_ref, t2_ref, s3_ref, t3_ref,
            out_ref, *, S: int, K: int):
    N, C = a_ref.shape[1], a_ref.shape[2]
    dt = a_ref.dtype
    f32 = jnp.float32

    def dot(a, b):
        return jnp.dot(a.astype(dt), b.astype(dt),
                       preferred_element_type=f32)

    # one-hot gather: (KS, N) selector @ (N, C) crop rows — MXU, exact
    idx = idx_ref[0]                                   # (KS, 1) int32
    lanes = jax.lax.broadcasted_iota(jnp.int32, (K * S, N), 1)
    oh = (lanes == idx).astype(dt)                     # (KS, N)
    g = dot(oh, a_ref[0])                              # (KS, C) f32

    ct = ct_ref[0].astype(f32)                         # (S, C)
    h = g + jnp.concatenate([ct] * K, axis=0)          # k-major center bcast
    h = jnp.maximum(h * s1_ref[:].astype(f32) + t1_ref[:].astype(f32), 0.0)
    h = dot(h, w2_ref[:])
    h = jnp.maximum(h * s2_ref[:].astype(f32) + t2_ref[:].astype(f32), 0.0)
    h = dot(h, w3_ref[:])
    h = jnp.maximum(h * s3_ref[:].astype(f32) + t3_ref[:].astype(f32), 0.0)

    acc = h[0:S]
    for k in range(1, K):
        acc = jnp.maximum(acc, h[k * S:(k + 1) * S])
    out_ref[0] = acc.astype(out_ref.dtype)


def fused_sa_convmax(A: jnp.ndarray, Ct: jnp.ndarray, idx: jnp.ndarray,
                     w2: jnp.ndarray, w3: jnp.ndarray,
                     s1, t1, s2, t2, s3, t3,
                     interpret: bool = False) -> jnp.ndarray:
    """Batched fused gather+MLP+max.

    Args:
        A: (B, N, C) per-point projected features (xyz @ W_d + points @ W_g).
        Ct: (B, S, C) per-center term (incl. conv1 bias).
        idx: (B, K*S, 1) int32 k-major flattened neighbor indices.
        w2/w3: (C, C) conv kernels.
        s*/t*: (C,) folded BN affine scale/shift per conv (bias folded in).
    Returns:
        (B, S, C) stage features (pre-self-attention).
    """
    B, N, C = A.shape
    S = Ct.shape[1]
    KS = idx.shape[1]
    K = KS // S
    assert K * S == KS, (KS, S)

    row = lambda v: v.reshape(1, -1)
    affines = [row(x) for x in (s1, t1, s2, t2, s3, t3)]

    batch = lambda i: (i, 0, 0)
    const2 = lambda i: (0, 0)

    in_specs = [
        pl.BlockSpec((1, N, C), batch, memory_space=pltpu.VMEM),     # A
        pl.BlockSpec((1, S, C), batch, memory_space=pltpu.VMEM),     # Ct
        pl.BlockSpec((1, KS, 1), batch, memory_space=pltpu.VMEM),    # idx
        pl.BlockSpec((C, C), const2, memory_space=pltpu.VMEM),       # w2
        pl.BlockSpec((C, C), const2, memory_space=pltpu.VMEM),       # w3
    ] + [pl.BlockSpec((1, C), const2, memory_space=pltpu.VMEM)
         for _ in affines]

    kern = functools.partial(_kernel, S=S, K=K)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, S, C), batch, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C), A.dtype),
        interpret=interpret,
    )(A, Ct, idx, w2, w3, *affines)


def sa_stage_inference(xyz: jnp.ndarray, points: Optional[jnp.ndarray],
                       idx: jnp.ndarray, params: dict, stats: dict,
                       dtype=jnp.float32, eps: float = 1e-5,
                       interpret: bool = False) -> jnp.ndarray:
    """Full eval-mode SA conv chain from the flax param/batch_stats trees.

    Args:
        xyz: (B, N, 3); points: (B, N, D) or None.
        idx: (B, S, K) kNN neighbor indices (centers = first S points,
            RANDOM sampling semantics).
        params: {'mlp_0': {'conv': {...}, 'bn': {...}}, 'mlp_1': ..., 'mlp_2': ...}
        stats: matching batch_stats tree ({'mlp_i': {'bn': {'mean','var'}}}).
    Returns:
        (B, S, C) features after max-over-k (feed the self-attention block).
    """
    B, S, K = idx.shape
    N = xyz.shape[1]
    dt = dtype
    # RANDOM sampling = arange(S) center indices, clamped like index_points
    # when a config oversamples (S > N): rows >= N repeat the last point
    cidx = jnp.clip(jnp.arange(S), 0, N - 1)

    def bn_affine(i, conv_bias):
        bn = params[f"mlp_{i}"]["bn"]
        st = stats[f"mlp_{i}"]["bn"]
        s = bn["scale"] / jnp.sqrt(st["var"] + eps)
        t = bn["bias"] - st["mean"] * s
        if conv_bias is not None:
            t = t + conv_bias * s
        return s.astype(jnp.float32), t.astype(jnp.float32)

    k1 = params["mlp_0"]["conv"]["kernel"]             # (3[+2D], C)
    b1 = params["mlp_0"]["conv"].get("bias")
    A, Ct = conv1_edge_factors(
        k1, b1, xyz, points, xyz[:, cidx],
        None if points is None else points[:, cidx], dt)

    s1, t1 = bn_affine(0, None)
    s2, t2 = bn_affine(1, params["mlp_1"]["conv"].get("bias"))
    s3, t3 = bn_affine(2, params["mlp_2"]["conv"].get("bias"))

    # k-major flatten: row = k*S + s
    idx_km = jnp.swapaxes(idx, 1, 2).reshape(B, K * S, 1).astype(jnp.int32)
    return fused_sa_convmax(
        A.astype(dt), Ct.astype(dt), idx_km,
        params["mlp_1"]["conv"]["kernel"], params["mlp_2"]["conv"]["kernel"],
        s1, t1, s2, t2, s3, t3, interpret=interpret)
