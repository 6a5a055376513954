#!/usr/bin/env python
"""Gather-strategy microbench at the flagship train shapes (TPU).

The train-step per-stage table (tools/profile_embed.py) blames the SA
grouping gathers for most of the embed bytes, yet a chunked one-hot scan
measured SLOWER than the native gather it replaced. This tool settles the
question with a clean A/B at the exact edge_split gather shapes
(2B=512 train batch, bf16):

  SA1: points (512, 128, 128), idx (512, 128, 32)  -> (512, 128, 32, 128)
  SA2: points (512, 128, 256), idx (512,  64, 48)  -> (512,  64, 48, 256)

strategies: native take_along_axis | one-hot einsum (method='onehot'; at
these shapes a single un-split selector)
directions: forward | vjp (scatter-add via jax.grad)

Prints one JSON line per (shape, strategy, direction): ms, XLA bytes/flops,
implied GB/s. Queue-20 + scalar-fetch sync (block_until_ready is a no-op
through the axon tunnel, CLAUDE.md).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/.cache/jax_comp_tpu", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from point_cloud_reid_tpu.ops.geometry import index_points


def _cost(compiled):
    try:
        c = compiled.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0)), float(c.get("bytes accessed", 0))
    except Exception:
        return 0.0, 0.0


def bench(name, fn, args, n=20):
    jitted = jax.jit(fn)
    compiled = jitted.lower(*args).compile()
    fl, by = _cost(compiled)
    out = compiled(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = compiled(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / n
    print(json.dumps(dict(
        name=name, ms=round(dt * 1e3, 3),
        GB=round(by / 1e9, 3), gflops=round(fl / 1e9, 2),
        gb_per_s=round(by / dt / 1e9, 1))), flush=True)


def main():
    rs = np.random.RandomState(0)
    shapes = [
        ("sa1", 512, 128, 128, 32, 128),
        ("sa2", 512, 128, 64, 48, 256),
    ]
    for tag, B, N, S, K, C in shapes:
        pts = jnp.asarray(rs.randn(B, N, C), dtype=jnp.bfloat16)
        idx = jnp.asarray(rs.randint(0, N, size=(B, S, K)).astype(np.int32))
        ct = jnp.asarray(rs.randn(B, S, K, C), dtype=jnp.bfloat16)
        for meth in ("take", "onehot"):
            fwd = lambda p, i, m=meth: index_points(p, i, method=m)
            bench(f"{tag}_fwd_{meth}", fwd, (pts, idx))
            vjp = (lambda p, i, c, m=meth: jax.grad(
                lambda q: jnp.sum(index_points(q, i, method=m).astype(
                    jnp.float32) * c.astype(jnp.float32)))(p))
            bench(f"{tag}_vjp_{meth}", vjp, (pts, idx, ct))


if __name__ == "__main__":
    main()
