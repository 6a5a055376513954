#!/usr/bin/env python
"""Roofline breakdown of the fused tracking frame: embed vs grid-score,
FLOPs + bytes from XLA cost analysis, measured time via scalar-fetch sync.

Usage: python tools/profile_frame.py  (on the TPU; compiles persist to the
bench cache). Prints one JSON line per program.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp_tpu", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(x):
    return float(jnp.sum(x))


def _cost(compiled):
    try:
        c = compiled.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return {k: float(v) for k, v in c.items()
                if k in ("flops", "bytes accessed", "transcendentals",
                         "utilization operand 0 {}", "optimal_seconds")
                or k.startswith("bytes accessed")}
    except Exception as e:
        return {"err": str(e)[:80]}


def bench_one(name, fn, args, n_iters=30):
    jitted = jax.jit(fn)
    compiled = jitted.lower(*args).compile()
    cost = _cost(compiled)
    out = compiled(*args)
    first = out[0] if isinstance(out, (tuple, list)) else out
    _sync(first)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = compiled(*args)
    first = out[0] if isinstance(out, (tuple, list)) else out
    _sync(first)
    dt = (time.perf_counter() - t0) / n_iters
    flops = cost.get("flops")
    bytes_acc = cost.get("bytes accessed")
    rec = dict(name=name, ms=round(dt * 1e3, 3),
               tflops_per_s=round(flops / dt / 1e12, 2) if flops else None,
               gb_per_s=round(bytes_acc / dt / 1e9, 1) if bytes_acc else None,
               flops_T=round(flops / 1e12, 4) if flops else None,
               bytes_GB=round(bytes_acc / 1e9, 3) if bytes_acc else None)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.inference import PairScorer
    from point_cloud_reid_tpu.models import build_model

    cfg = get_experiment("pts_point-transformer_point-cat_nus_det_4x256_500e")
    model = build_model(cfg["model"], dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    batch = dict(sparse_1=jax.random.normal(rng, (2, 128, 3)),
                 sparse_2=jax.random.normal(rng, (2, 128, 3)),
                 id_1=jnp.zeros((2,), jnp.int32),
                 id_2=jnp.zeros((2,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)

    NT, ND, NPTS = 128, 128, 128
    dets = jax.random.normal(jax.random.PRNGKey(2), (ND, NPTS, 3))
    tracks = jax.random.normal(jax.random.PRNGKey(3), (NT, NPTS, 3))
    scorer = PairScorer(model, variables)
    xyz_t, h_t = scorer.embed(tracks)
    xyz_d, h_d = scorer.embed(dets)

    # 1. embed-only
    def embed_only(variables, pts):
        return model.apply(variables, pts, train=False, method="embed")[1]
    bench_one("embed_128dets", embed_only, (variables, dets))

    # 2. grid-score-only (per-object embeddings in)
    def grid_only(variables, h_t, xyz_t, h_d, xyz_d):
        from point_cloud_reid_tpu.inference.pair_scoring import _pair_grid
        h1, h2 = _pair_grid(h_t, h_d, NT, ND)
        x1, x2 = _pair_grid(xyz_t, xyz_d, NT, ND)
        logits, _ = model.apply(variables, h1, x1, h2, x2, train=False,
                                method="match_logits")
        return logits.reshape(NT, ND)
    bench_one("grid_128x128", grid_only, (variables, h_t, xyz_t, h_d, xyz_d))

    # 3. full fused frame (headline program)
    frame_fn = scorer.make_frame_fn(NT, ND)
    jitted = frame_fn.jitted
    compiled = jitted.lower(variables, h_t, xyz_t, dets).compile()
    cost = _cost(compiled)
    out = compiled(variables, h_t, xyz_t, dets)
    _sync(out[0])
    t0 = time.perf_counter()
    for _ in range(30):
        out = compiled(variables, h_t, xyz_t, dets)
    _sync(out[0])
    dt = (time.perf_counter() - t0) / 30
    print(json.dumps(dict(name="fused_frame", ms=round(dt * 1e3, 3),
                          flops_T=round(cost.get("flops", 0) / 1e12, 4),
                          bytes_GB=round(cost.get("bytes accessed", 0) / 1e9, 3),
                          tflops_per_s=round(cost.get("flops", 0) / dt / 1e12, 2),
                          gb_per_s=round(cost.get("bytes accessed", 0) / dt / 1e9, 1))),
          flush=True)


if __name__ == "__main__":
    main()
