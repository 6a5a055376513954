#!/usr/bin/env python
"""TPU timing for the fused pallas match-grid kernel vs the XLA grid path."""
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


def _sync(x):
    return float(jnp.sum(x))


def main():
    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.models import build_model
    from point_cloud_reid_tpu.ops.pallas.match_grid import pallas_grid_logits

    det_block = int(sys.argv[1]) if len(sys.argv) > 1 else 8
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

    @jax.jit
    def embed(variables, pts):
        return model.apply(variables, pts, train=False, method="embed")

    xyz_t, h_t = embed(variables, tracks)
    xyz_d, h_d = embed(variables, dets)

    @jax.jit
    def xla_grid(variables, h_t, xyz_t, h_d, xyz_d):
        return model.apply(variables, h_t, xyz_t, h_d, xyz_d, train=False,
                           method="match_logits_grid")

    @jax.jit
    def pallas_grid(variables, h_t, xyz_t, h_d, xyz_d):
        return pallas_grid_logits(model, variables, h_t, xyz_t, h_d, xyz_d,
                                  det_block=det_block)

    ref = xla_grid(variables, h_t, xyz_t, h_d, xyz_d)
    _sync(ref)
    out = pallas_grid(variables, h_t, xyz_t, h_d, xyz_d)
    _sync(out)
    diff = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                 - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    args = (variables, h_t, xyz_t, h_d, xyz_d)
    bench(f"xla_grid/bd{det_block}", xla_grid, args, n=30, jit=False)
    bench(f"pallas_grid/bd{det_block}", pallas_grid, args, n=30, jit=False)
    print(json.dumps(dict(name="max_abs_diff", value=diff, ref_scale=scale)),
          flush=True)


if __name__ == "__main__":
    main()
