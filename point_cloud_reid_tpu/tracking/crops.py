"""Per-box point-crop extraction, fixed-shape and jit-compiled.

Equivalent of the reference's crop frontend for tracking
(trackers/deprecated/pc_utils.py:31-96: points_in_boxes via CUDA, per-box
inverse-affine centering, random subsample-with-replacement to a fixed size,
zeros for empty boxes) — rebuilt as one fused XLA program: the (N, M)
membership mask, the box-frame transform, and the masked resample run
batched on device with static shapes; no per-box host loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import points_in_rboxes


@functools.partial(jax.jit, static_argnames=("subsample_number",))
def extract_box_crops(rng: jax.Array, points: jnp.ndarray, boxes: jnp.ndarray,
                      subsample_number: int = 128):
    """Extract centered fixed-size crops for every box.

    Args:
        rng: PRNG key for the resample-with-replacement.
        points: (N, 3) lidar sweep (extra feature columns allowed, ignored).
        boxes: (M, 7) [cx, cy, cz, dx, dy, dz, yaw].
    Returns:
        crops: (M, subsample_number, 3) box-frame points; all-zeros when a box
            holds no points (reference soft-failure semantics,
            pc_utils.py:85-95).
        counts: (M,) int32 number of sweep points inside each box.
    """
    pts = points[:, :3]
    N = pts.shape[0]
    M = boxes.shape[0]

    # boxes here are gravity-centered (the reference's DepthInstance3DBoxes
    # origin=(0.5,0.5,0.5), pc_utils.py:46); points_in_rboxes expects z-bottom
    boxes_zb = boxes.at[:, 2].add(-boxes[:, 5] * 0.5)
    inside = points_in_rboxes(pts, boxes_zb)                 # (N, M) bool
    counts = jnp.sum(inside, axis=0).astype(jnp.int32)       # (M,)

    # box-frame transform: translate to center, rotate by -yaw around z
    rel = pts[None, :, :] - boxes[:, None, :3]               # (M, N, 3)
    c, s = jnp.cos(-boxes[:, 6]), jnp.sin(-boxes[:, 6])
    x = rel[..., 0] * c[:, None] - rel[..., 1] * s[:, None]
    y = rel[..., 0] * s[:, None] + rel[..., 1] * c[:, None]
    centered = jnp.stack([x, y, rel[..., 2]], axis=-1)       # (M, N, 3)

    # masked resample with replacement: draw subsample_number indices per box
    # uniformly over that box's member points (categorical over the mask).
    logits = jnp.where(inside.T, 0.0, -jnp.inf)              # (M, N)
    idx = jax.random.categorical(
        rng, logits[:, None, :], axis=-1,
        shape=(M, subsample_number))                         # (M, S)
    # categorical on an all -inf row returns arbitrary indices; zero those out
    crops = jnp.take_along_axis(centered, idx[..., None], axis=1)
    crops = jnp.where((counts > 0)[:, None, None], crops, 0.0)
    return crops, counts
