"""Fused kNN Pallas kernel: pairwise square distance + iterative k-argmin.

TPU-native equivalent of the reference's heap-based kNN CUDA extension
(mmdet3d/ops/knn/src/knn_cuda.cu) and of the argsort topk used by the active
path (mmdet3d/models/pointnet2_utils.py:190-216). The XLA path
(`ops.geometry.knn_indices`) materializes the (B, S, N) distance tensor in
HBM and argsorts it; this kernel keeps the per-row (S, N) distance block in
VMEM, extracts the k minima in-place, and only writes the (S, k) index block
— an HBM traffic reduction of ~N/k (e.g. 2048/48 ≈ 42x for the dense
ablations).

Tie-breaking: first occurrence wins (== stable argsort order), so results
are bit-identical to `knn_indices(method='argsort')` on duplicated points.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import argmin_first, interpret_default


def _knn_kernel(q_ref, db_ref, out_ref, d_scratch, *, k: int):
    """One batch row: q (S, C), db (N, C) -> out (S, k) int32 indices."""
    q = q_ref[...]
    db = db_ref[...]
    n = db.shape[0]

    # ||q||^2 - 2 q.db + ||db||^2 — the matmul rides the MXU.
    inner = jnp.dot(q, db.T, preferred_element_type=jnp.float32)
    s2 = jnp.sum(q * q, axis=-1, keepdims=True)
    d2 = jnp.sum(db * db, axis=-1, keepdims=True)
    d_scratch[...] = s2 - 2.0 * inner + d2.T

    col = jax.lax.broadcasted_iota(jnp.int32, d_scratch.shape, 1)

    # static unroll over k (Mosaic fori_loop supports only full/no unroll;
    # k <= 48 in all configs so full unroll is cheap and fastest)
    for j in range(k):
        d = d_scratch[...]
        _, idx = argmin_first(d, axis=-1)              # (S,), first-occurrence
        out_ref[:, pl.ds(j, 1)] = idx[:, None]
        d_scratch[...] = jnp.where(col == idx[:, None], jnp.inf, d)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_pallas(new_xyz: jnp.ndarray, xyz: jnp.ndarray, k: int,
               interpret: bool | None = None) -> jnp.ndarray:
    """k nearest neighbors of `new_xyz` queries among `xyz` database points.

    Args:
        new_xyz: (B, S, C) queries.
        xyz: (B, N, C) database.
        k: number of neighbors (static).
    Returns:
        (B, S, k) int32 indices, first-occurrence tie order.
    """
    if interpret is None:
        interpret = interpret_default()
    B, S, C = new_xyz.shape
    _, N, _ = xyz.shape
    assert k <= N, f"k={k} > N={N}"

    return pl.pallas_call(
        functools.partial(_knn_kernel, k=k),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, S, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, S, k), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, k), jnp.int32),
        scratch_shapes=[pltpu.VMEM((S, N), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * N * C + B * k * S * N * 4,
            bytes_accessed=4 * B * (S * C + N * C + S * k),
            transcendentals=0,
        ),
        interpret=interpret,
    )(new_xyz.astype(jnp.float32), xyz.astype(jnp.float32))
