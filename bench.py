#!/usr/bin/env python
"""Headline benchmark: Siamese pairwise comparisons/sec/chip.

Measures the reference's real-time tracking workload (SURVEY.md §3.5 /
BASELINE.json): per frame, embed new detections once (amortized backbone),
then score the full tracks x detections grid through the cross-attention match
head. The reference achieves "thousands of pairwise comparisons in real-time
(10 Hz)" on GPU via a per-pair gather loop; here the grid is one fused batched
XLA program. Target: >= 100k pairs/s on v5e-8 == 12.5k pairs/s/chip.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_PER_CHIP = 100_000 / 8   # BASELINE.json: 100k pairs/s on v5e-8


def main():
    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.inference import PairScorer
    from point_cloud_reid_tpu.models import build_model

    cfg = get_experiment("pts_point-transformer_point-cat_nus_det_4x256_500e")
    model = build_model(cfg["model"], dtype=jnp.bfloat16)

    # tracking-frame scale: 128 live tracks x 128 detections, 128-pt crops
    # (dense-scene nuScenes frame; per-frame cost is embed(dets) + full grid)
    NT, ND, NPTS = 128, 128, 128
    rng = jax.random.PRNGKey(0)
    batch = dict(
        sparse_1=jax.random.normal(rng, (2, NPTS, 3)),
        sparse_2=jax.random.normal(rng, (2, NPTS, 3)),
        id_1=jnp.zeros((2,), jnp.int32), id_2=jnp.zeros((2,), jnp.int32),
    )
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)
    scorer = PairScorer(model, variables)

    dets = jax.random.normal(jax.random.PRNGKey(2), (ND, NPTS, 3))
    tracks = jax.random.normal(jax.random.PRNGKey(3), (NT, NPTS, 3))
    xyz_t, h_t = scorer.embed(tracks)

    # production fast path: embed(dets) + full grid in ONE jitted program
    frame_fn = scorer.make_frame_fn(NT, ND)

    def frame():
        mat, _, _ = frame_fn(h_t, xyz_t, dets)
        return mat

    # warmup / compile
    jax.block_until_ready(frame())

    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        mat = frame()
    jax.block_until_ready(mat)
    dt = time.perf_counter() - t0

    pairs_per_sec = NT * ND * n_iters / dt
    n_chips = max(jax.device_count(), 1)
    value = pairs_per_sec / n_chips
    print(json.dumps(dict(
        metric="pairwise_comparisons_per_sec_per_chip",
        value=round(value, 1),
        unit="pairs/s/chip",
        vs_baseline=round(value / TARGET_PER_CHIP, 3),
    )))


if __name__ == "__main__":
    main()
