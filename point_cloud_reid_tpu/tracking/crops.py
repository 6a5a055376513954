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
    S = subsample_number

    # boxes here are gravity-centered (the reference's DepthInstance3DBoxes
    # origin=(0.5,0.5,0.5), pc_utils.py:46); points_in_rboxes expects z-bottom
    boxes_zb = boxes.at[:, 2].add(-boxes[:, 5] * 0.5)
    inside = points_in_rboxes(pts, boxes_zb)                 # (N, M) bool

    # Masked resample with replacement, count-bounded: draw a uniform member
    # RANK r in [0, count) per (box, slot) and locate the r-th member of the
    # mask. Same distribution as a categorical over the mask, but WITHOUT
    # materializing Gumbel noise over (M, S, N) — at tracker scale (M=256
    # boxes, N=262144-padded sweep) categorical's broadcast noise alone is
    # 68.7 GB of HBM traffic per frame.
    #
    # The lookup is TWO-LEVEL (sqrt-decomposed): a flat (M, N) rank cumsum +
    # vmap'd searchsorted measured 8.2 + 11.4 ms on v5e (the full-width
    # parallel-prefix moves ~3 GB, and the 18-round binary search runs
    # latency-bound gathers at 40 GB/s). Instead: per-block member counts
    # (M, nb) -> tiny cumsum -> binary search picks the BLOCK (9 rounds on a
    # VMEM-resident table), then the target block's mask rows are gathered
    # (contiguous (M, S, B) chunks) and the within-block rank resolved by a
    # lane-local prefix count. Selection is bit-identical to the flat
    # searchsorted (tests pin it); the crop stage fell 19.2 -> ~4 ms.
    B = 512                                # points per block (~sqrt N)
    if N % B:                              # sweep pads are powers of two
        B = next(b for b in (256, 128, 64, 32, 16, 8, 4, 2, 1) if N % b == 0)
    nb = N // B
    blk = inside.T.reshape(M, nb, B)                         # (M, nb, B)
    bcum = jnp.cumsum(jnp.sum(blk, axis=2, dtype=jnp.int32), axis=1)
    counts = bcum[:, -1]                                     # (M,) members
    u = jax.random.uniform(rng, (M, S))
    r = jnp.floor(u * counts[:, None]).astype(jnp.int32)
    r = jnp.minimum(r, jnp.maximum(counts[:, None] - 1, 0))  # count>0 rows
    t = r + 1                                                # target rank
    b = jax.vmap(lambda row, q: jnp.searchsorted(row, q, side="left"))(
        bcum, t)                                             # (M, S) block id
    b = jnp.minimum(b, nb - 1)             # empty box -> nb, clamp
    prev = jnp.where(b > 0,
                     jnp.take_along_axis(bcum, jnp.maximum(b - 1, 0), axis=1),
                     0)                                      # members before b
    loc = jnp.take_along_axis(blk, b[:, :, None], axis=1)    # (M, S, B)
    lcum = jnp.cumsum(loc.astype(jnp.int32), axis=2)
    p = jnp.sum(lcum < (t - prev)[:, :, None], axis=2)       # rank in block
    idx = b * B + p
    idx = jnp.minimum(idx, N - 1)          # empty box: clamp then zero

    # gather the S raw points FIRST, then box-frame-transform only those —
    # the old transform-everything order materialized two (M, N, 3) tensors
    raw = pts[idx]                                           # (M, S, 3)
    rel = raw - boxes[:, None, :3]
    c, s = jnp.cos(-boxes[:, 6]), jnp.sin(-boxes[:, 6])
    x = rel[..., 0] * c[:, None] - rel[..., 1] * s[:, None]
    y = rel[..., 0] * s[:, None] + rel[..., 1] * c[:, None]
    crops = jnp.stack([x, y, rel[..., 2]], axis=-1)          # (M, S, 3)
    crops = jnp.where((counts > 0)[:, None, None], crops, 0.0)
    return crops, counts
