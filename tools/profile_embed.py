#!/usr/bin/env python
"""Per-stage timing of the point-transformer embed path on TPU."""
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


def bench(name, fn, *args, n=30):
    jitted = jax.jit(fn)
    compiled = jitted.lower(*args).compile()
    cost = {}
    try:
        c = compiled.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        cost = dict(flops=c.get("flops"), bytes=c.get("bytes accessed"))
    except Exception:
        pass
    out = compiled(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    _sync(first)
    t0 = time.perf_counter()
    for _ in range(n):
        out = compiled(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    _sync(first)
    dt = (time.perf_counter() - t0) / n
    print(json.dumps(dict(
        name=name, ms=round(dt * 1e3, 3),
        GB=round((cost.get("bytes") or 0) / 1e9, 3),
        gflops=round((cost.get("flops") or 0) / 1e9, 2))), flush=True)
    return out


def main():
    from point_cloud_reid_tpu.models.point_transformer import (
        SetAbstractionEdgeSA, FeaturePropagationSA)
    from point_cloud_reid_tpu.ops import sample_and_group_edge

    dt = jnp.bfloat16
    B, N = 128, 128
    rng = jax.random.PRNGKey(0)
    xyz = jax.random.normal(rng, (B, N, 3))

    # SA1: in 3 -> 32, S=128, K=32
    sa1 = SetAbstractionEdgeSA(mlp=[3, 32, 32, 32], nsample=32, dtype=dt)
    v1 = sa1.init(jax.random.PRNGKey(1), xyz, None, N, train=False)
    x1, f1 = bench("sa1", lambda v, x: sa1.apply(v, x, None, N, train=False),
                   v1, xyz)

    # SA2: in 64+3 -> 64, S=64, K=48   (feature dim doubles via edge concat)
    sa2 = SetAbstractionEdgeSA(mlp=[67, 64, 64, 64], nsample=48, dtype=dt)
    v2 = sa2.init(jax.random.PRNGKey(2), x1, f1, 64, train=False)
    x2, f2 = bench("sa2", lambda v, x, f: sa2.apply(v, x, f, 64, train=False),
                   v2, x1, f1)

    # SA3: in 128+3 -> 128, S=32, K=48
    sa3 = SetAbstractionEdgeSA(mlp=[131, 128, 128, 128], nsample=48, dtype=dt)
    v3 = sa3.init(jax.random.PRNGKey(3), x2, f2, 32, train=False)
    x3, f3 = bench("sa3", lambda v, x, f: sa3.apply(v, x, f, 32, train=False),
                   v3, x2, f2)

    # grouping-only cost of SA2 (gather + edge concat, no convs)
    bench("sa2_group_only",
          lambda x, f: sample_and_group_edge(nsample=48, xyz=x, points=f,
                                             numpoints=64)[1], x1, f1)

    # FP3: coarse 32 -> fine 64
    fp = FeaturePropagationSA(feat1_dim=64, feat2_dim=128, d_model=128,
                              out_dim=128, dtype=dt)
    vf = fp.init(jax.random.PRNGKey(4), x2, x3, f2, f3)
    bench("fp3", lambda v, a, b, c, d: fp.apply(v, a, b, c, d), vf, x2, x3,
          f2, f3)


if __name__ == "__main__":
    main()
