"""Farthest point sampling Pallas kernel.

TPU-native equivalent of the reference's block-parallel FPS CUDA extension
(mmdet3d/ops/furthest_point_sample/src/furthest_point_sample_cuda.cu:26).
FPS is inherently sequential in npoint; the kernel keeps the (1, N) running
min-distance buffer in VMEM scratch and performs one masked argmax per
iteration — no HBM round-trips inside the loop.

Semantics match `ops.geometry.farthest_point_sample(deterministic_start=True)`:
start at index 0 (the active configs never use FPS — sampling='RANDOM',
reference backbone_net.py:55-77 — so the deterministic start is only a
convention; pass a start index for randomized behavior).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import argmax_first, interpret_default


def _fps_kernel(start_ref, xyz_ref, out_ref, dist_scratch, *, npoint: int):
    """One batch row: xyz (N, 3) -> out (1, npoint) int32 indices.

    `start_ref` is the scalar-prefetch (B,) start-index array
    (pltpu.PrefetchScalarGridSpec) — SMEM blocks of rank-1 arrays are not
    tileable on real TPUs, scalar prefetch is the supported route."""
    xyz = xyz_ref[...]                                     # (N, C)
    dist_scratch[...] = jnp.full(dist_scratch.shape, 1e10, jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, xyz.shape[:1] + (1,), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)

    def body(i, carry):
        farthest, acc = carry
        # both the output write and the centroid gather use vector selects:
        # Mosaic supports neither dynamic-lane stores nor dynamic_slice on
        # values inside kernels
        acc = jnp.where(lanes == i, farthest, acc)         # (1, npoint)
        sel = (rows == farthest).astype(xyz.dtype)         # (N, 1)
        centroid = jnp.sum(xyz * sel, axis=0, keepdims=True)   # (1, C)
        d = jnp.sum((xyz - centroid) ** 2, axis=-1)[None]  # (1, N)
        nd = jnp.minimum(dist_scratch[...], d)
        dist_scratch[...] = nd
        _, idx = argmax_first(nd, axis=-1)                 # (1,)
        return idx[0], acc

    acc0 = jnp.zeros((1, npoint), jnp.int32)
    _, acc = jax.lax.fori_loop(0, npoint, body,
                               (start_ref[pl.program_id(0)], acc0))
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(xyz: jnp.ndarray, npoint: int,
               start: jnp.ndarray | None = None,
               interpret: bool | None = None) -> jnp.ndarray:
    """Farthest point sampling.

    Args:
        xyz: (B, N, C) points.
        npoint: number of samples (static).
        start: optional (B,) int32 start indices (default all-zero).
    Returns:
        (B, npoint) int32 sample indices.
    """
    if interpret is None:
        interpret = interpret_default()
    B, N, C = xyz.shape
    assert npoint <= N, f"npoint={npoint} > N={N}"
    if start is None:
        start = jnp.zeros((B,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, N, C), lambda b, start_ref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 1, npoint),
                               lambda b, start_ref: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, N), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        interpret=interpret,
    )(start.astype(jnp.int32), xyz.astype(jnp.float32))[:, 0, :]
