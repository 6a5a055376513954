#!/usr/bin/env python
"""Cost bisection of the fused match-grid kernel: which piece eats the ms.

Compiles the kernel with progressively disabled pieces (debug_skip) and
times each on hardware. Differences attribute per-piece cost:

    full                 the production kernel
    no_stage2            stage 1 + pooling only   -> stage-2 cost
    no_ffn               ffn = merge+LN residual  -> fc1/fc2 cost
    no_ln                LNs as plain affine      -> LN reduction cost
    no_stage2_no_ffn     stage-1 messages + pool  -> floor

Usage: python tools/profile_grid_pieces.py [det_block]
       python tools/profile_grid_pieces.py --image [det_block] [vmem_mb]
           (64x64 DeiT grid, S=198 padded tokens — attributes the image
           kernel's ms; image det_block=32 needs vmem_mb ~34, the 20 MB
           default only fits det_block<=16)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from _bench import bench, setup_cache

setup_cache()


def main():
    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.models import build_model
    from point_cloud_reid_tpu.ops.pallas.match_grid import (
        pallas_grid_logits, pallas_image_grid_logits)

    args = [a for a in sys.argv[1:] if a != "--image"]
    image = "--image" in sys.argv[1:]
    det_block = int(args[0]) if args else 16
    vmem_mb = int(args[1]) if len(args) > 1 else 20

    variants = dict(
        full=frozenset(),
        no_stage2=frozenset({"stage2"}),
        no_ffn=frozenset({"ffn"}),
        no_ln=frozenset({"ln"}),
        no_stage2_no_ffn=frozenset({"stage2", "ffn"}),
        no_s2_ffn_ln=frozenset({"stage2", "ffn", "ln"}),
    )

    if image:
        from point_cloud_reid_tpu.inference import PairScorer
        cfg = get_experiment("rgb_deit-tiny_point-cat_r_nus_det_4x60_200e")
        model = build_model(cfg["model"], dtype=jnp.bfloat16)
        NT = ND = 64
        crops = jax.random.normal(jax.random.PRNGKey(0), (ND, 3, 224, 224))
        batch = dict(sparse_1=crops[:2], sparse_2=crops[:2],
                     id_1=jnp.zeros((2,), jnp.int32),
                     id_2=jnp.zeros((2,), jnp.int32))
        variables = model.init(jax.random.PRNGKey(1), batch, train=False)
        _, h_d = PairScorer(model, variables, image_mode=True).embed(crops)
        h_t = h_d[:NT]
        for name, skip in variants.items():
            fn = (lambda v, a, b, s=skip: pallas_image_grid_logits(
                model, v, a, b, det_block=det_block,
                vmem_limit_mb=vmem_mb, debug_skip=s))
            bench(name, fn, (variables, h_t, h_d), n=30)
        return

    cfg = get_experiment("pts_point-transformer_point-cat_nus_det_4x256_500e")
    model = build_model(cfg["model"], dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    batch = dict(sparse_1=jax.random.normal(rng, (2, 128, 3)),
                 sparse_2=jax.random.normal(rng, (2, 128, 3)),
                 id_1=jnp.zeros((2,), jnp.int32),
                 id_2=jnp.zeros((2,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)

    NT, ND, NPTS = 128, 128, 128

    @jax.jit
    def embed(variables, pts):
        return model.apply(variables, pts, train=False, method="embed")

    xyz_t, h_t = embed(variables,
                       jax.random.normal(jax.random.PRNGKey(3), (NT, NPTS, 3)))
    xyz_d, h_d = embed(variables,
                       jax.random.normal(jax.random.PRNGKey(2), (ND, NPTS, 3)))

    for name, skip in variants.items():
        fn = (lambda v, a, b, c, d, s=skip: pallas_grid_logits(
            model, v, a, b, c, d, det_block=det_block, debug_skip=s))
        bench(name, fn, (variables, h_t, xyz_t, h_d, xyz_d), n=30)


if __name__ == "__main__":
    main()
