#!/usr/bin/env python
"""Empirical matmul roofs for the shapes the frame programs actually use.

The chip's 197 TFLOP/s bf16 peak assumes 128x128x128+ contractions; the match
head is C=64 wide and the backbone 128-512. This measures achieved TFLOP/s
for chained matmuls at each shape so per-stage efficiency claims compare
against an achievable roof, not the marketing number.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from _bench import bench, setup_cache

setup_cache()


def roof(m, k, n, chain=None, n_iters=20, dtype=jnp.bfloat16):
    """Chained (m,k)@(k,n) matmuls; the chain serializes on the data path so
    the measurement is compute, not dispatch. The chain length scales so one
    program does >= ~300 GFLOP — programs below ~10 ms just measure the
    ~2.4 ms per-dispatch floor through the tunnel."""
    if chain is None:
        chain = max(16, min(512, int(300e9 / (2.0 * m * n * n))))
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), dtype)
    ws = [jax.random.normal(jax.random.PRNGKey(i + 1), (k if i == 0 else n, n),
                            dtype) for i in range(chain)]

    def f(a, ws):
        x = a
        for w in ws:
            x = jnp.dot(x, w, preferred_element_type=jnp.float32
                        ).astype(dtype)
        return x

    shape = f"({m},{k})@({k},{n})x{chain}"
    dt, _ = bench(shape, f, (a, ws), n=n_iters)
    flops = 2.0 * m * n * (k + (chain - 1) * n)
    # analytic TFLOP/s (the harness line reports XLA-counted flops, which
    # match here but keep the original roof number explicit)
    rec = dict(shape=shape, tflops_per_s=round(flops / dt / 1e12, 1),
               ms=round(dt * 1e3, 3))
    print(json.dumps(rec), flush=True)
    return rec


def main():
    # match-head shapes (C=64): stage matmuls and ffn — rows scaled up so the
    # efficiency class (the K/N widths) is measured, not the dispatch floor
    roof(65536, 64, 64)        # batched (bd*N, C)@(C, C) class
    roof(65536, 128, 128)      # ffn fc1 (2C wide) class
    roof(65536, 128, 64)       # ffn fc2 class
    # backbone shapes
    roof(32768, 256, 256)      # SA2 group convs class
    roof(16384, 512, 512)      # SA3 group convs class
    roof(65536, 128, 128, chain=128)   # SA1 convs class
    # sanity ceiling: big square
    roof(8192, 1024, 1024)


if __name__ == "__main__":
    main()
