#!/usr/bin/env python
"""Piece-wise breakdown of the gated-sparse cached tracker frame (the
device program behind bench.py's tracker_e2e_256_ms): crop extraction vs
detection embed vs cache scatter/gather vs sparse pair scoring (factors +
one-hot pair gathers + fused pair kernel + match head).

Measured v5e history at the Waymo-dense bucket: the first sparse frame ran
32.9 ms fused (crops 19.2, embed 11.3, cache 2.3, score 4.1) — the crop
stage's flat (M, N) rank cumsum + 18-round binary search dominated; the
two-level sqrt-decomposed lookup (tracking/crops.py) cut crops to 9.1 ms
standalone and the fused frame to 21.0 ms (embed 11.3 is now the largest
piece and is already the pallas SA-stage kernel).

Each piece is jitted separately at the Waymo-dense steady-state bucket
(t_pad=512 tracks, d_pad=256 dets, 196608-pt padded sweep — the production
SWEEP_SIZES rung for a 153.6k Waymo-dense sweep, p_pad=1024
gated pairs) and timed with the scalar-fetch sync (tools/_bench.bench —
block_until_ready is a no-op through the axon tunnel). The sum of pieces
slightly exceeds the fused frame (XLA fuses across stage boundaries).

Usage: python tools/profile_sparse_frame.py [T_PAD=512] [D_PAD=256] [P_PAD=1024]
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
    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.inference import PairScorer
    from point_cloud_reid_tpu.inference.pair_scoring import _embed_tokens
    from point_cloud_reid_tpu.models import build_model
    from point_cloud_reid_tpu.tracking.crops import extract_box_crops

    T_PAD = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    D_PAD = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    P_PAD = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    # 196608 = the Waymo-dense 153.6k sweep's production pad bucket
    # (manager.SWEEP_SIZES); pass a 4th arg to probe another rung
    NPTS, CAP = 128, 512
    SWEEP = int(sys.argv[4]) if len(sys.argv) > 4 else 196608

    cfg = get_experiment("pts_point-transformer_point-cat_nus_det_4x256_500e")
    model = build_model(cfg["model"], dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    batch = dict(sparse_1=jax.random.normal(rng, (2, NPTS, 3)),
                 sparse_2=jax.random.normal(rng, (2, NPTS, 3)),
                 id_1=jnp.zeros((2,), jnp.int32),
                 id_2=jnp.zeros((2,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)
    scorer = PairScorer(model, variables)
    model = scorer.model          # pallas-embed clone on TPU

    rs = np.random.RandomState(0)
    pts = jnp.asarray(rs.rand(SWEEP, 3).astype(np.float32) * 40 - 20)
    boxes = jnp.asarray(np.concatenate(
        [rs.rand(D_PAD, 3).astype(np.float32) * 40 - 20,
         np.full((D_PAD, 3), 2.0, np.float32),
         np.zeros((D_PAD, 1), np.float32)], axis=1))

    # 1. crop extraction from the padded sweep
    def crops_fn(pts, boxes):
        return extract_box_crops(jax.random.PRNGKey(7), pts, boxes, NPTS)[0]
    crops_s, _ = bench(f"crops sweep{SWEEP}xd{D_PAD}", crops_fn, (pts, boxes))
    crops = jax.jit(crops_fn)(pts, boxes)

    # 2. detection embed (the SA backbone; pallas SA-stage kernel on TPU)
    def embed_fn(variables, crops):
        return _embed_tokens(model, variables, crops, False)[1]
    embed_s, _ = bench(f"embed d{D_PAD}", embed_fn, (variables, crops))
    xyz_d, h_d = jax.jit(lambda v, c: _embed_tokens(model, v, c, False))(
        variables, crops)

    # 3. cache scatter (prev dets -> slots) + slot gather (tracks for frame)
    h_buf = jnp.zeros((CAP + 1, NPTS, h_d.shape[-1]), h_d.dtype)
    xyz_buf = jnp.zeros((CAP + 1, NPTS, 3), jnp.float32)
    upd = jnp.arange(D_PAD, dtype=jnp.int32)
    slots = jnp.arange(T_PAD, dtype=jnp.int32) % CAP

    def cache_fn(h_buf, xyz_buf, h_d, xyz_d):
        h_buf = h_buf.at[upd].set(h_d[upd])
        xyz_buf = xyz_buf.at[upd].set(xyz_d[upd])
        return h_buf[slots], xyz_buf[slots]
    cache_s, _ = bench(f"cache t{T_PAD}", cache_fn,
                       (h_buf, xyz_buf, h_d, xyz_d),
                       sync=lambda out: out[0])
    h_t, xyz_t = jax.jit(cache_fn)(h_buf, xyz_buf, h_d, xyz_d)

    # 4. sparse pair scoring: factors + one-hot pair gathers + kernel + head
    pair_t = jnp.asarray(rs.randint(0, T_PAD, size=P_PAD), jnp.int32)
    pair_d = jnp.asarray(rs.randint(0, D_PAD, size=P_PAD), jnp.int32)
    backend = scorer._pair_backend(P_PAD)

    def score_fn(variables, h_t, xyz_t, h_d, xyz_d, pair_t, pair_d):
        return scorer._pair_logits(variables, h_t, xyz_t, h_d, xyz_d,
                                   pair_t, pair_d, backend)
    score_s, _ = bench(f"sparse_score p{P_PAD} ({backend})", score_fn,
                       (variables, h_t, xyz_t, h_d, xyz_d, pair_t, pair_d))

    # 5. the fused frame program (what the manager actually dispatches)
    fn = scorer.make_cached_pair_frame_fn(T_PAD, D_PAD, D_PAD, P_PAD, CAP,
                                          NPTS)
    frame_s, _ = bench(
        f"fused_pair_frame t{T_PAD}xd{D_PAD}xp{P_PAD}", fn.jitted,
        (variables, h_buf, xyz_buf, h_d, xyz_d, upd, upd, slots,
         pair_t, pair_d, jnp.int32(7), pts, boxes),
        jit=False, sync=lambda out: out[2])

    print(json.dumps(dict(
        name="sparse_frame_pieces", t_pad=T_PAD, d_pad=D_PAD, p_pad=P_PAD,
        crops_ms=round(crops_s * 1e3, 2), embed_ms=round(embed_s * 1e3, 2),
        cache_ms=round(cache_s * 1e3, 2), score_ms=round(score_s * 1e3, 2),
        pieces_sum_ms=round((crops_s + embed_s + cache_s + score_s) * 1e3, 2),
        fused_frame_ms=round(frame_s * 1e3, 2))), flush=True)


if __name__ == "__main__":
    main()
