"""Voxelization and scatter ops as fixed-shape jnp (segment_sum based).

TPU-native equivalents of the reference's voxel CUDA extension
(ops/voxel/voxelize.py — hard Voxelization and DynamicScatter). Dynamic voxel counts
become capped static shapes with validity masks so everything jits.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def voxelize_hard(
    points: jnp.ndarray,
    voxel_size: Tuple[float, float, float],
    pc_range: Tuple[float, float, float, float, float, float],
    max_points_per_voxel: int,
    max_voxels: int,
):
    """Hard voxelization with static output shapes.

    Args:
        points: (N, C) with xyz in the first 3 channels.
    Returns:
        voxels:      (max_voxels, max_points_per_voxel, C)
        coords:      (max_voxels, 3) int32 (z, y, x) grid coords, -1 for empty slots
        num_points:  (max_voxels,) int32 valid point count per voxel
        num_voxels:  () int32

    Matches the semantics of the hard Voxelization op (ops/voxel/voxelize.py:10):
    first-come voxel slots, points beyond max_points_per_voxel dropped.
    """
    vs = jnp.asarray(voxel_size, points.dtype)
    lo = jnp.asarray(pc_range[:3], points.dtype)
    hi = jnp.asarray(pc_range[3:], points.dtype)
    grid = jnp.floor((hi - lo) / vs).astype(jnp.int32)

    coord_f = jnp.floor((points[:, :3] - lo) / vs)
    coord = coord_f.astype(jnp.int32)
    in_range = jnp.all((coord >= 0) & (coord < grid[None]), axis=1)

    # linearize (x fastest) for dedup; invalid points map to a sentinel bucket
    lin = (coord[:, 2] * grid[1] + coord[:, 1]) * grid[0] + coord[:, 0]
    lin = jnp.where(in_range, lin, jnp.iinfo(jnp.int32).max)

    # sort points by voxel id -> contiguous segments, stable keeps point order
    order = jnp.argsort(lin, stable=True)
    lin_sorted = lin[order]
    pts_sorted = points[order]
    valid_sorted = in_range[order]

    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool), lin_sorted[1:] != lin_sorted[:-1]]
    ) & valid_sorted
    voxel_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1          # per-point voxel slot
    voxel_id = jnp.where(valid_sorted, voxel_id, max_voxels)       # overflow bucket
    voxel_id = jnp.minimum(voxel_id, max_voxels)

    # rank of each point inside its voxel
    n = points.shape[0]
    idx = jnp.arange(n)
    seg_start = jnp.where(new_seg, idx, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank = idx - seg_start
    slot_ok = (rank < max_points_per_voxel) & (voxel_id < max_voxels)

    voxels = jnp.zeros((max_voxels + 1, max_points_per_voxel, points.shape[1]),
                       points.dtype)
    vid = jnp.where(slot_ok, voxel_id, max_voxels)
    rnk = jnp.where(slot_ok, rank, 0)
    voxels = voxels.at[vid, rnk].set(jnp.where(slot_ok[:, None], pts_sorted, 0.0))

    num_points = jax.ops.segment_sum(slot_ok.astype(jnp.int32), vid,
                                     num_segments=max_voxels + 1)
    coords_sorted = coord[order]
    coords_zyx = coords_sorted[:, ::-1]
    coords_out = jnp.full((max_voxels + 1, 3), -1, jnp.int32)
    first = new_seg & (voxel_id < max_voxels)
    coords_out = coords_out.at[jnp.where(first, voxel_id, max_voxels)].set(
        jnp.where(first[:, None], coords_zyx, -1))
    num_voxels = jnp.sum((new_seg & (voxel_id < max_voxels)).astype(jnp.int32))
    return voxels[:max_voxels], coords_out[:max_voxels], num_points[:max_voxels], num_voxels


def dynamic_scatter_mean(
    feats: jnp.ndarray, voxel_ids: jnp.ndarray, num_voxels: int
):
    """Mean-scatter features into voxels (DynamicScatter equivalent).

    Args:
        feats: (N, C); voxel_ids: (N,) int32 in [0, num_voxels) or -1 for invalid.
    Returns:
        (num_voxels, C) means, (num_voxels,) counts.
    """
    valid = voxel_ids >= 0
    ids = jnp.where(valid, voxel_ids, num_voxels)
    sums = jax.ops.segment_sum(jnp.where(valid[:, None], feats, 0.0), ids,
                               num_segments=num_voxels + 1)[:num_voxels]
    counts = jax.ops.segment_sum(valid.astype(feats.dtype), ids,
                                 num_segments=num_voxels + 1)[:num_voxels]
    return sums / jnp.maximum(counts[:, None], 1.0), counts


def bev_pool(feats: jnp.ndarray, ranks: jnp.ndarray, num_bins: int) -> jnp.ndarray:
    """Sum-pool features into BEV pillars by precomputed rank ids.

    Equivalent of the bev_pool cumsum-trick op (ops/bev_pool/bev_pool.py) — on TPU a
    single segment_sum is the right primitive.
    feats: (N, C); ranks: (N,) int32 bin ids (-1 = drop). Returns (num_bins, C).
    """
    valid = ranks >= 0
    ids = jnp.where(valid, ranks, num_bins)
    out = jax.ops.segment_sum(jnp.where(valid[:, None], feats, 0.0), ids,
                              num_segments=num_bins + 1)
    return out[:num_bins]
