#!/usr/bin/env python
"""Empirical VPU elementwise roofs on the v5e (chained ops, f32 vs bf16).

Complements profile_matmul_roof.py: the fused match-grid kernel is
elementwise-bound by its LN/normalizer/residual traffic, so its honest
hardware roof is MXU time + VPU time at THESE rates, not the matmul peak.
Measures Gelem/s for representative op mixes on (8192, 128) tiles.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from _bench import bench as _hbench, setup_cache

setup_cache()


def bench(name, step, dtype, chain=600, m=8192, c=128, n_iters=20):
    x = jax.random.normal(jax.random.PRNGKey(0), (m, c), dtype)
    s = jax.random.normal(jax.random.PRNGKey(1), (1, c), dtype)

    def f(x, s):
        for _ in range(chain):
            x = step(x, s)
        return x

    dt, _ = _hbench(f"{name}/{dtype.__name__}", f, (x, s), n=n_iters)
    gelem = m * c * chain / dt / 1e9
    print(json.dumps(dict(name=name, dtype=str(dtype.__name__),
                          gelem_per_s=round(gelem, 1),
                          ms=round(dt * 1e3, 3))), flush=True)


def main():
    mul_add = lambda x, s: x * s + s                     # 2 flops/elem
    def ln_ish(x, s):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) * (x - mu), axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * s + s
    exp_min = lambda x, s: jnp.exp(jnp.minimum(x, 0.0)) + jnp.maximum(x, 0.0)

    for dtype in (jnp.float32, jnp.bfloat16):
        bench("mul_add", mul_add, dtype)
        bench("ln_pass", ln_ish, dtype, chain=150)
        bench("elu1", exp_min, dtype, chain=300)


if __name__ == "__main__":
    main()
