#!/usr/bin/env python
"""Convert a reference PyTorch .pth checkpoint to this framework's format.

Usage:
    python tools/convert_checkpoint.py <ckpt.pth> <experiment-name> <out-dir>
        [--image] [--no-strict]

Maps the torch state dict (reference naming, mmdet3d/models/ReIDNet.py) onto
the flax variable tree of the named experiment's model and saves it with
orbax. Load in training/eval via --checkpoint <out-dir>.
"""
from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("experiment")
    ap.add_argument("out_dir")
    ap.add_argument("--image", action="store_true",
                    help="image-branch checkpoint (skips dead cross-stage pos_mlp)")
    ap.add_argument("--no-strict", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.convert import (convert_reidnet_state_dict,
                                              load_torch_state_dict)
    from point_cloud_reid_tpu.convert.torch_checkpoint import (
        convert_image_reidnet_state_dict)
    from point_cloud_reid_tpu.models import build_model

    cfg = get_experiment(args.experiment)
    model = build_model(cfg["model"])
    if args.image:
        B, example = 2, dict(
            img_1=jnp.zeros((2, 224, 224, 3)), img_2=jnp.zeros((2, 224, 224, 3)))
    else:
        n = cfg["dataset"].get("subsample_number", 128)
        example = dict(sparse_1=jnp.zeros((2, n, 3)),
                       sparse_2=jnp.zeros((2, n, 3)))
    example.update(id_1=jnp.zeros((2,), jnp.int32),
                   id_2=jnp.zeros((2,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), example, train=False)

    sd = load_torch_state_dict(args.checkpoint)
    if args.image:
        variables, report = convert_image_reidnet_state_dict(
            sd, variables, strict=not args.no_strict)
    else:
        variables, report = convert_reidnet_state_dict(
            sd, variables, strict=not args.no_strict)

    import orbax.checkpoint as ocp
    path = os.path.abspath(args.out_dir)
    ocp.PyTreeCheckpointer().save(path, jax.device_get(variables), force=True)
    print(json.dumps(dict(
        saved=path,
        unmatched_torch=len(report["unmatched_torch"]),
        unfilled_flax=len(report["unfilled_flax"]))))
    for k in report["unmatched_torch"][:10]:
        print("  unmatched:", k)
    for k in report["unfilled_flax"][:10]:
        print("  unfilled:", k)


if __name__ == "__main__":
    main()
