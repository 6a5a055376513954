#!/usr/bin/env python
"""TPU A/B for the image-branch fused pallas grid vs the hoisted XLA grid.

The image frame (DeiT-tiny, 64x64 grid; bench.py `image_frame_ms`) splits
into crop embedding (ViT) + the CrossLinAttn pair grid. This tool times the
grid alone both ways and the full frame both ways, plus a max-abs-diff parity
check at the real S=198 token count (in-kernel pad-row masking).

Usage: python tools/profile_image_grid.py [det_block] [NT=64] [ND=64] [vmem_mb=20]
"""
from __future__ import annotations

import json
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
    from point_cloud_reid_tpu.ops.pallas.match_grid import \
        pallas_image_grid_logits

    det_block = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    NT = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    ND = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    vmem_mb = int(sys.argv[4]) if len(sys.argv) > 4 else 20

    cfg = get_experiment("rgb_deit-tiny_point-cat_r_nus_det_4x60_200e")
    model = build_model(cfg["model"], dtype=jnp.bfloat16)
    crops = jax.random.normal(jax.random.PRNGKey(0), (ND, 3, 224, 224))
    batch = dict(sparse_1=crops[:2], sparse_2=crops[:2],
                 id_1=jnp.zeros((2,), jnp.int32),
                 id_2=jnp.zeros((2,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)

    scorer = PairScorer(model, variables, image_mode=True)
    _, h_dets = scorer.embed(crops)
    h_t = h_dets[:NT] if NT <= ND else jnp.concatenate(
        [h_dets] * (NT // ND + 1), axis=0)[:NT]
    print(json.dumps(dict(name="setup", S=int(h_t.shape[1]),
                          C=int(h_t.shape[2]), det_block=det_block,
                          backend_routed=scorer._grid_backend(ND))),
          flush=True)

    def xla_grid(variables, h_t, h_d):
        return model.apply(variables, h_t, h_d, train=False,
                           method="match_logits_grid")

    def pallas_grid(variables, h_t, h_d):
        return pallas_image_grid_logits(model, variables, h_t, h_d,
                                        det_block=det_block,
                                        vmem_limit_mb=vmem_mb)

    _, ref = bench("image_xla_grid", xla_grid, (variables, h_t, h_dets))
    _, out = bench("image_pallas_grid", pallas_grid, (variables, h_t, h_dets))
    diff = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                 - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(json.dumps(dict(name="max_abs_diff", value=round(diff, 5),
                          ref_scale=round(scale, 3))), flush=True)

    # full frame (embed + grid) both ways — what bench.py image_frame_ms sees
    for name, backend in (("image_frame_xla", "xla"),
                          ("image_frame_auto", "auto")):
        sc = PairScorer(model, variables, image_mode=True, backend=backend)
        frame = sc.make_frame_fn(NT, ND)
        bench(name, frame.jitted, (variables, h_t, None, crops),
              sync=lambda o: o[0], jit=False)


if __name__ == "__main__":
    main()
