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

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench import bench, setup_cache

setup_cache()

from point_cloud_reid_tpu.ops.geometry import index_points


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
