#!/usr/bin/env python
"""A/B sweep of crop-extraction variants (tracking/crops.py candidates).

Every variant locates the SAME t-th member of the same membership mask, so
outputs are bit-identical to production extract_box_crops (asserted here on
device) — only the decomposition changes:

    layout   nm: (N, M) membership then transpose (production r4)
             mb: membership computed directly in (M, nb, B) block layout
                 (points reshaped per block; no transpose pass)
    B        second-level block width (production: 512 = sqrt N)
    pick     ss: vmap'd searchsorted (9-11 rounds of gathers)
             cs: dense compare-sum  b = sum_j [bcum_j < t]  (one (M,S,nb)
                 broadcast compare; no gather latency chains)

Usage: python tools/profile_crop_variants.py [SWEEP=262144] [M=256] [S=128]
"""
from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench import bench, setup_cache

setup_cache()


@functools.partial(jax.jit, static_argnames=("S", "B", "layout", "pick"))
def crops_variant(rng, points, boxes, S=128, B=512, layout="nm", pick="ss"):
    from point_cloud_reid_tpu.ops import points_in_rboxes

    pts = points[:, :3]
    N, M = pts.shape[0], boxes.shape[0]
    nb = N // B
    boxes_zb = boxes.at[:, 2].add(-boxes[:, 5] * 0.5)

    if layout == "nm":
        inside = points_in_rboxes(pts, boxes_zb)             # (N, M)
        blk = inside.T.reshape(M, nb, B)
    else:                                                    # block layout
        pb = pts.reshape(nb, B, 3)
        rel = pb[None, :, :, :2] - boxes_zb[:, None, None, :2]  # (M,nb,B,2)
        c = jnp.cos(-boxes_zb[:, 6])[:, None, None]
        s = jnp.sin(-boxes_zb[:, 6])[:, None, None]
        lx = rel[..., 0] * c - rel[..., 1] * s
        ly = rel[..., 0] * s + rel[..., 1] * c
        in_x = jnp.abs(lx) <= (boxes_zb[:, 3] * 0.5)[:, None, None]
        in_y = jnp.abs(ly) <= (boxes_zb[:, 4] * 0.5)[:, None, None]
        z = pb[None, :, :, 2]
        in_z = ((z >= boxes_zb[:, 2][:, None, None]) &
                (z <= (boxes_zb[:, 2] + boxes_zb[:, 5])[:, None, None]))
        blk = in_x & in_y & in_z                             # (M, nb, B)

    bcum = jnp.cumsum(jnp.sum(blk, axis=2, dtype=jnp.int32), axis=1)
    counts = bcum[:, -1]
    u = jax.random.uniform(rng, (M, S))
    r = jnp.floor(u * counts[:, None]).astype(jnp.int32)
    r = jnp.minimum(r, jnp.maximum(counts[:, None] - 1, 0))
    t = r + 1

    if pick == "ss":
        b = jax.vmap(lambda row, q: jnp.searchsorted(row, q, side="left"))(
            bcum, t)
        b = jnp.minimum(b, nb - 1)
    else:                                                    # compare-sum
        b = jnp.sum(bcum[:, None, :] < t[:, :, None], axis=2,
                    dtype=jnp.int32)                         # (M, S)
        b = jnp.minimum(b, nb - 1)

    prev = jnp.where(b > 0,
                     jnp.take_along_axis(bcum, jnp.maximum(b - 1, 0), axis=1),
                     0)
    loc = jnp.take_along_axis(blk, b[:, :, None], axis=1)
    lcum = jnp.cumsum(loc.astype(jnp.int32), axis=2)
    p = jnp.sum(lcum < (t - prev)[:, :, None], axis=2)
    idx = jnp.minimum(b * B + p, N - 1)

    raw = pts[idx]
    rel = raw - boxes[:, None, :3]
    c, s = jnp.cos(-boxes[:, 6]), jnp.sin(-boxes[:, 6])
    x = rel[..., 0] * c[:, None] - rel[..., 1] * s[:, None]
    y = rel[..., 0] * s[:, None] + rel[..., 1] * c[:, None]
    crops = jnp.stack([x, y, rel[..., 2]], axis=-1)
    return jnp.where((counts > 0)[:, None, None], crops, 0.0)


def main():
    from point_cloud_reid_tpu.tracking.crops import extract_box_crops

    SWEEP = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    rs = np.random.RandomState(0)
    pts = jnp.asarray(rs.rand(SWEEP, 3).astype(np.float32) * 40 - 20)
    boxes = jnp.asarray(np.concatenate(
        [rs.rand(M, 3).astype(np.float32) * 40 - 20,
         np.full((M, 3), 2.0, np.float32),
         np.zeros((M, 1), np.float32)], axis=1))
    key = jax.random.PRNGKey(7)

    ref = jax.jit(lambda p, b: extract_box_crops(key, p, b, S)[0])(pts, boxes)
    dt, _ = bench("production", lambda p, b: extract_box_crops(
        key, p, b, S)[0], (pts, boxes))
    results = {"production": round(dt * 1e3, 2)}

    for layout in ("nm", "mb"):
        for B in (128, 256, 512, 1024):
            if SWEEP % B:
                continue
            for pick in ("ss", "cs"):
                name = f"{layout}_B{B}_{pick}"
                fn = (lambda p, b, B=B, layout=layout, pick=pick:
                      crops_variant(key, p, b, S=S, B=B, layout=layout,
                                    pick=pick))
                dt, out = bench(name, fn, (pts, boxes))
                same = bool(jnp.array_equal(out, ref))
                results[name] = round(dt * 1e3, 2)
                if not same:
                    results[name + "_MISMATCH"] = True

    print(json.dumps(dict(name="crop_variants", sweep=SWEEP, m=M, s=S,
                          **results)), flush=True)


if __name__ == "__main__":
    main()
