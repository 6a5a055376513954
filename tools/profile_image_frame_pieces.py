#!/usr/bin/env python
"""Piece-wise breakdown of the fused IMAGE-branch cached tracker frame (the
device program behind bench.py's image_tracker_e2e_ms): 6-camera box
projection + bilinear crops vs DeiT-tiny embed + token downsample vs cache
scatter/gather vs 64x64 grid scoring.

The point branch's sparse-frame dissection (tools/profile_sparse_frame.py)
is the model: each piece is jitted separately at the e2e bench shapes
(6x 1600x900 uint8 cameras, 64 boxes, t_pad=d_pad=64, DeiT-tiny S=198
tokens) and timed with the scalar-fetch sync (tools/_bench.bench —
block_until_ready is a no-op through the axon tunnel). The sum of pieces
can exceed the fused frame (XLA fuses across stage boundaries).

`--u8cols` A/Bs the crop stage's column gather on the uint8 row band
(convert AFTER both gathers) against the production band->f32-first order.

Reference workload: ImageReidentifier per-frame crops + cached features
(trackers/deprecated/tracking_point_reid.py:125-203, pc_utils.py:239-303).

Usage: python tools/profile_image_frame_pieces.py [N_OBJ=64] [--u8cols]
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
from bench import camera_ring  # the e2e bench's ring: one shared workload

setup_cache()


def main():
    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.inference import PairScorer
    from point_cloud_reid_tpu.models import build_model
    from point_cloud_reid_tpu.tracking.image_crops import crops_per_frame

    N = next((int(a) for a in sys.argv[1:] if a.isdigit()), 64)
    CAP = 512
    IMG, OUT = (1600, 900), (224, 224)

    cfg = get_experiment("rgb_deit-tiny_point-cat_r_nus_det_4x60_200e")
    model = build_model(cfg["model"], dtype=jnp.bfloat16)
    batch = dict(sparse_1=jnp.zeros((2, 3, 224, 224)),
                 sparse_2=jnp.zeros((2, 3, 224, 224)),
                 id_1=jnp.zeros((2,), jnp.int32),
                 id_2=jnp.zeros((2,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)
    scorer = PairScorer(model, variables, image_mode=True)

    l2cs, Ks = camera_ring()
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.randint(0, 256, (6, 3, 900, 1600),
                                    dtype=np.uint8))
    ang = rs.rand(N) * 2 * np.pi
    rad = 8.0 + rs.rand(N) * 20.0
    centers = np.stack([rad * np.cos(ang), rad * np.sin(ang),
                        np.zeros(N)], axis=1).astype(np.float32)
    boxes = jnp.asarray(np.concatenate(
        [centers, np.full((N, 3), 2.0, np.float32),
         np.zeros((N, 1), np.float32)], axis=1))
    l2cs_d, Ks_d = jnp.asarray(l2cs), jnp.asarray(Ks)

    # 1. projection + best-camera bilinear crops from the uint8 frame stack
    def crops_fn(images, l2cs, Ks, boxes):
        return crops_per_frame(images, l2cs, Ks, boxes,
                               image_size=IMG, output_size=OUT)[0]
    crops_s, crops = bench(f"image_crops 6cam->d{N}", crops_fn,
                           (images, l2cs_d, Ks_d, boxes))

    if "--u8cols" in sys.argv or "--f32band" in sys.argv:
        # A/B the superseded band->f32-FIRST order against production.
        # History: production originally converted the full (M, 2oh, ch, W)
        # row band to f32 before the column gathers (~550 MB materialized
        # at 64 boxes); keeping uint8 through BOTH gathers measured 1.65x
        # faster bit-identically (9.64 -> 5.83 ms, v5e 2026-08-20) and was
        # promoted to production (image_crops._crops_from_best). This
        # variant re-creates the OLD order so the win stays re-measurable.
        def crops_f32band(images, l2cs, Ks, boxes):
            from point_cloud_reid_tpu.tracking.image_crops import (
                boxes_2d, project_boxes)

            def per_cam(l2c, K):
                uv, vis = project_boxes(boxes, l2c, K, IMG)
                b2 = boxes_2d(uv, IMG)
                area = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
                return b2, jnp.where(vis, area, -1.0)

            b2_all, area_all = jax.vmap(per_cam)(l2cs, Ks)
            best_cam = jnp.argmax(area_all, axis=0)
            valid = jnp.max(area_all, axis=0) > 0
            M = boxes.shape[0]
            b2 = b2_all[best_cam, jnp.arange(M)].astype(jnp.float32)
            _, ch, H, W = images.shape
            oh, ow = OUT
            x0, y0, x1, y1 = b2[:, 0], b2[:, 1], b2[:, 2], b2[:, 3]
            xs = x0[:, None] + (x1 - x0)[:, None] * (jnp.arange(ow) + 0.5) / ow
            ys = y0[:, None] + (y1 - y0)[:, None] * (jnp.arange(oh) + 0.5) / oh
            xf = jnp.clip(xs - 0.5, 0.0, W - 1.0)
            yf = jnp.clip(ys - 0.5, 0.0, H - 1.0)
            x0i = jnp.floor(xf).astype(jnp.int32)
            y0i = jnp.floor(yf).astype(jnp.int32)
            x1i = jnp.minimum(x0i + 1, W - 1)
            y1i = jnp.minimum(y0i + 1, H - 1)
            wx = (xf - x0i)[:, None, None, :]
            wy = (yf - y0i)
            yy = jnp.concatenate([y0i, y1i], axis=1)
            # the superseded order: full band to f32 BEFORE column gathers
            band = images[best_cam[:, None], :, yy, :].astype(jnp.float32)

            def cols(xi):
                return jnp.take_along_axis(band, xi[:, None, None, :],
                                           axis=3)

            horiz = cols(x0i) * (1.0 - wx) + cols(x1i) * wx
            top, bot = horiz[:, :oh], horiz[:, oh:]
            out = (top * (1.0 - wy)[:, :, None, None]
                   + bot * wy[:, :, None, None]).transpose(0, 2, 1, 3)
            out = out * (1.0 / 255.0)
            return jnp.where(valid[:, None, None, None], out, 0.0)

        ab_s, ab_crops = bench(f"image_crops_f32band 6cam->d{N}",
                               crops_f32band, (images, l2cs_d, Ks_d, boxes))
        diff = float(jnp.max(jnp.abs(ab_crops - crops)))
        print(json.dumps(dict(name="f32band_vs_prod",
                              ms=round(ab_s * 1e3, 2),
                              prod_ms=round(crops_s * 1e3, 2),
                              max_abs_diff=diff)), flush=True)

    # 2. ViT embed + token downsample (the in-frame embedding)
    def embed_fn(variables, crops):
        return scorer._embed_image_crops(variables, crops)
    embed_s, h_d = bench(f"deit_embed d{N}", embed_fn, (variables, crops))
    S, C = h_d.shape[1], h_d.shape[2]

    # 3. cache scatter (prev dets -> slots) + slot gather (frame tracks)
    h_buf = jnp.zeros((CAP + 1, S, C), h_d.dtype)
    upd = jnp.arange(N, dtype=jnp.int32)
    slots = jnp.arange(N, dtype=jnp.int32)

    def cache_fn(h_buf, h_d):
        h_buf = h_buf.at[upd].set(h_d[upd])
        return h_buf[slots]
    cache_s, h_t = bench(f"cache t{N}", cache_fn, (h_buf, h_d))

    # 4. the 64x64 grid (pallas image match-grid kernel on TPU)
    backend = scorer._grid_backend(N)

    def grid_fn(variables, h_t, h_d):
        return scorer._image_grid_logits(variables, h_t, h_d, backend)
    grid_s, _ = bench(f"image_grid {N}x{N} ({backend})", grid_fn,
                      (variables, h_t, h_d))

    # 5. the fused frame program (what the manager actually dispatches)
    fn = scorer.make_cached_image_frame_fn(N, N, N, CAP, IMG, OUT)
    frame_s, _ = bench(
        f"fused_image_frame t{N}xd{N}", fn.jitted,
        (variables, h_buf, h_d, upd, upd, slots, images, l2cs_d, Ks_d,
         boxes), jit=False, sync=lambda out: out[1])

    print(json.dumps(dict(
        name="image_frame_pieces", n=N, tokens=S, channels=C,
        crops_ms=round(crops_s * 1e3, 2), embed_ms=round(embed_s * 1e3, 2),
        cache_ms=round(cache_s * 1e3, 2), grid_ms=round(grid_s * 1e3, 2),
        pieces_sum_ms=round((crops_s + embed_s + cache_s + grid_s) * 1e3, 2),
        fused_frame_ms=round(frame_s * 1e3, 2))), flush=True)


if __name__ == "__main__":
    main()
