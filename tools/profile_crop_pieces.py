#!/usr/bin/env python
"""Sub-piece bisection of tracker crop extraction (tracking/crops.py).

The Waymo-dense sparse frame spends ~9 ms standalone in extract_box_crops
(profile_sparse_frame.py); this attributes it across the stages so the next
optimization targets the real cost:

    membership    points_in_rboxes: (N, M) rotated-box test
    blockcounts   (M, nb, B) reshape + per-block sums + cumsum
    blockpick     vmap'd searchsorted over the (M, nb) block cumsum
    withinblock   (M, S, B) block-row gather + lane prefix count -> idx
    gather_tf     point gather + box-frame transform + empty-box zeroing
    full          the production extract_box_crops

Each piece is jitted separately on realistic intermediates (the sum of
pieces can exceed `full` — XLA fuses across piece boundaries).

Usage: python tools/profile_crop_pieces.py [SWEEP=262144] [M=256] [S=128]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench import bench, setup_cache

setup_cache()


def main():
    from point_cloud_reid_tpu.ops import points_in_rboxes

    SWEEP = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    N = SWEEP
    # production's block-size fallback ladder (tracking/crops.py): a bare
    # 512-or-1 fallback would time a degenerate (M, N, 1) block layout at
    # non-512-divisible sweeps that production never runs
    B = next(b for b in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1) if N % b == 0)
    nb = N // B

    rs = np.random.RandomState(0)
    pts = jnp.asarray(rs.rand(N, 3).astype(np.float32) * 40 - 20)
    boxes = jnp.asarray(np.concatenate(
        [rs.rand(M, 3).astype(np.float32) * 40 - 20,
         np.full((M, 3), 2.0, np.float32),
         np.zeros((M, 1), np.float32)], axis=1))
    boxes_zb = boxes.at[:, 2].add(-boxes[:, 5] * 0.5)

    res = {}

    def member_fn(pts, boxes_zb):
        return points_in_rboxes(pts[:, :3], boxes_zb)
    # bench() returns the stage output — reuse it instead of re-jitting each
    # stage (every fresh compile costs a multi-second tunnel round trip)
    dt, inside = bench("membership", member_fn, (pts, boxes_zb))
    res["membership_ms"] = round(dt * 1e3, 2)

    def counts_fn(inside):
        blk = inside.T.reshape(M, nb, B)
        bcum = jnp.cumsum(jnp.sum(blk, axis=2, dtype=jnp.int32), axis=1)
        return blk, bcum, bcum[:, -1]
    dt, (blk, bcum, counts) = bench("blockcounts", counts_fn, (inside,),
                                    sync=lambda out: out[2])
    res["blockcounts_ms"] = round(dt * 1e3, 2)

    u = jax.random.uniform(jax.random.PRNGKey(7), (M, S))
    r = jnp.floor(u * counts[:, None]).astype(jnp.int32)
    r = jnp.minimum(r, jnp.maximum(counts[:, None] - 1, 0))
    t = r + 1

    def pick_fn(bcum, t):
        b = jax.vmap(lambda row, q: jnp.searchsorted(row, q, side="left"))(
            bcum, t)
        return jnp.minimum(b, nb - 1)
    dt, b = bench("blockpick", pick_fn, (bcum, t))
    res["blockpick_ms"] = round(dt * 1e3, 2)

    def within_fn(blk, bcum, b, t):
        prev = jnp.where(
            b > 0,
            jnp.take_along_axis(bcum, jnp.maximum(b - 1, 0), axis=1), 0)
        loc = jnp.take_along_axis(blk, b[:, :, None], axis=1)
        lcum = jnp.cumsum(loc.astype(jnp.int32), axis=2)
        p = jnp.sum(lcum < (t - prev)[:, :, None], axis=2)
        return jnp.minimum(b * B + p, N - 1)
    dt, idx = bench("withinblock", within_fn, (blk, bcum, b, t))
    res["withinblock_ms"] = round(dt * 1e3, 2)

    def gather_fn(pts, boxes, idx, counts):
        raw = pts[:, :3][idx]
        rel = raw - boxes[:, None, :3]
        c, s = jnp.cos(-boxes[:, 6]), jnp.sin(-boxes[:, 6])
        x = rel[..., 0] * c[:, None] - rel[..., 1] * s[:, None]
        y = rel[..., 0] * s[:, None] + rel[..., 1] * c[:, None]
        crops = jnp.stack([x, y, rel[..., 2]], axis=-1)
        return jnp.where((counts > 0)[:, None, None], crops, 0.0)
    dt, _ = bench("gather_tf", gather_fn, (pts, boxes, idx, counts))
    res["gather_tf_ms"] = round(dt * 1e3, 2)

    from point_cloud_reid_tpu.tracking.crops import extract_box_crops

    def full_fn(pts, boxes):
        return extract_box_crops(jax.random.PRNGKey(7), pts, boxes, S)[0]
    dt, _ = bench("full", full_fn, (pts, boxes))
    res["full_ms"] = round(dt * 1e3, 2)

    print(json.dumps(dict(name="crop_pieces", sweep=N, m=M, s=S, **res)),
          flush=True)


if __name__ == "__main__":
    main()
