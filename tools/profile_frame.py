#!/usr/bin/env python
"""Roofline breakdown of the fused tracking frame: embed vs grid-score,
FLOPs + bytes from XLA cost analysis, measured time via scalar-fetch sync
(tools/_bench.py — queued executions, last-output scalar fetch).

Usage: python tools/profile_frame.py [NT=128] [ND=128]  (on the TPU;
compiles persist to the bench cache). Prints one JSON line per program:
embed, hoisted XLA grid, fused pallas grid, and the full fused frame
bench.py's headline measures.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from _bench import bench, setup_cache

setup_cache()


def main():
    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.inference import PairScorer
    from point_cloud_reid_tpu.models import build_model
    from point_cloud_reid_tpu.ops.pallas.match_grid import pallas_grid_logits

    NT = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ND = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    NPTS = 128

    cfg = get_experiment("pts_point-transformer_point-cat_nus_det_4x256_500e")
    model = build_model(cfg["model"], dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    batch = dict(sparse_1=jax.random.normal(rng, (2, 128, 3)),
                 sparse_2=jax.random.normal(rng, (2, 128, 3)),
                 id_1=jnp.zeros((2,), jnp.int32),
                 id_2=jnp.zeros((2,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)

    dets = jax.random.normal(jax.random.PRNGKey(2), (ND, NPTS, 3))
    tracks = jax.random.normal(jax.random.PRNGKey(3), (NT, NPTS, 3))
    scorer = PairScorer(model, variables)
    xyz_t, h_t = scorer.embed(tracks)
    xyz_d, h_d = scorer.embed(dets)

    # 1. embed-only (backbone over the new detections)
    def embed_only(variables, pts):
        return model.apply(variables, pts, train=False, method="embed")[1]
    bench("embed_dets", embed_only, (variables, dets))

    # 2. grid-score-only, hoisted XLA path (per-object embeddings in)
    def xla_grid(variables, h_t, xyz_t, h_d, xyz_d):
        return model.apply(variables, h_t, xyz_t, h_d, xyz_d, train=False,
                           method="match_logits_grid")
    bench("xla_grid", xla_grid, (variables, h_t, xyz_t, h_d, xyz_d))

    # 3. grid-score-only, fused pallas kernel (what PairScorer routes)
    def pallas_grid(variables, h_t, xyz_t, h_d, xyz_d):
        return pallas_grid_logits(model, variables, h_t, xyz_t, h_d, xyz_d,
                                  det_block=32)
    bench("pallas_grid", pallas_grid, (variables, h_t, xyz_t, h_d, xyz_d))

    # 4. full fused frame (the bench.py headline program)
    frame = scorer.make_frame_fn(NT, ND)
    bench("fused_frame", frame.jitted, (variables, h_t, xyz_t, dets),
          sync=lambda o: o[0], jit=False)


if __name__ == "__main__":
    main()
