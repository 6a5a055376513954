#!/usr/bin/env python
"""Training CLI.

TPU-native replacement for the reference's torchpack launch
(`torchpack dist-run -np N python tools/train.py <config> --seed 66`,
README Usage / tools/train.py:23-134). One process drives all local chips via
SPMD jit — no dist-run, no per-GPU processes:

    python tools/train.py pts_point-transformer_point-cat_nus_det_4x256_500e \
        --root /data/nuscenes-reid --work-dir runs/exp1 --seed 66

With no --root a synthetic store is generated (smoke-scale by default) so the
full pipeline runs anywhere.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("experiment", help="experiment name (configs.EXPERIMENTS) ")
    p.add_argument("--root", default=None, help="crop-store root; synthetic "
                   "data when omitted")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint to load (load_from semantics)")
    p.add_argument("--resume", default=None,
                   help="orbax checkpoint to resume full training state from "
                        "(resume_from semantics: params + optimizer + step)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the first epochs "
                        "into DIR (view with tensorboard/xprof)")
    p.add_argument("--seed", type=int, default=66)       # reference default
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None,
                   help="global batch; default samples_per_device * n_devices")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--synthetic-objects", type=int, default=60)
    p.add_argument("--loader-threads", type=int, default=None,
                   help="BatchLoader worker threads (default: one per mesh "
                        "device, min 2 — the native read pool scales past "
                        "the per-thread planning rate)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the forward in backward "
                        "(jax.checkpoint) — fits ~4x larger per-chip batches")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (TPU mixed precision)")
    p.add_argument("--set", dest="set_options", action="append", default=[],
                   metavar="KEY.PATH=VALUE",
                   help="dotted-path config override (repeatable) — the "
                        "reference's --cfg-options: e.g. "
                        "--set losses_to_use.kl=true --set schedule.lr=1e-4 "
                        "--set model.backbone.mul=2")
    return p.parse_args(argv)


def build_all(cfg, args):
    import jax.numpy as jnp
    from point_cloud_reid_tpu.configs import get_experiment  # noqa
    from point_cloud_reid_tpu.data import (BatchLoader, CropStore,
                                           SyntheticStore, build_pair_dataset)
    from point_cloud_reid_tpu.models import build_model
    from point_cloud_reid_tpu.parallel import make_mesh
    from point_cloud_reid_tpu.train import (Trainer, TrainState,
                                            build_optimizer)

    dcfg = cfg["dataset"]
    losses = cfg.get("losses_to_use", {})
    with_dense = bool(losses.get("shape") or losses.get("dense"))
    dcfg = dict(dcfg,
                train=dict(dcfg["train"], with_dense=with_dense),
                val=dict(dcfg["val"], with_dense=with_dense))
    complete_store = None
    if args.root:
        store = CropStore(args.root)
        from point_cloud_reid_tpu.data import CompleteStore
        complete_store = CompleteStore(
            args.root, subsample_num=dcfg.get("subsample_dense", 2048))
    else:
        store = SyntheticStore(
            num_objects=args.synthetic_objects,
            class_names=list(dcfg["train"]["classes"]),
            with_images=(dcfg["train"]["mode"] == "image"),
            crop_size=(224, 224) if dcfg["train"]["mode"] == "image"
            else (32, 32))
    if complete_store is None and hasattr(store, "load_complete"):
        complete_store = store              # synthetic store carries shapes
    train_ds = build_pair_dataset(dcfg["train"], store, complete_store)
    val_ds = build_pair_dataset(dcfg["val"], store, complete_store)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    batch = args.batch_size or dcfg["samples_per_device"] * n_dev
    batch = max(n_dev, min(batch, max(len(train_ds) // 2, n_dev)))
    batch -= batch % n_dev

    # one loader thread per chip keeps an N-chip DP step fed (the reference
    # uses workers_per_gpu subprocesses, apis/train.py:37)
    # getattr: callers that build their own Namespace (tools/parity_eval.py,
    # tools/test.py) predate this flag
    threads = getattr(args, "loader_threads", None) or max(2, n_dev)
    # multi-process (multi-host) runs: every process plans the same global
    # order and loads only its contiguous batch slice — the reference's
    # per-rank DistributedSampler (apis/train.py:34-45)
    shard = dict(shard_id=jax.process_index(), num_shards=jax.process_count())
    train_loader = BatchLoader(train_ds, batch_size=batch, shuffle=True,
                               seed=args.seed, num_threads=threads, **shard)
    val_loader = BatchLoader(val_ds, batch_size=batch, shuffle=False,
                             drop_last=True, num_threads=threads, **shard)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = build_model(cfg["model"], dtype=dtype)

    sched = cfg["schedule"]
    if args.epochs:
        sched.max_epochs = args.epochs
    tx = build_optimizer(sched, steps_per_epoch=max(len(train_loader), 1))

    runtime = dict(cfg["runtime"])
    runtime.update(
        work_dir=args.work_dir, seed=args.seed,
        max_epochs=sched.max_epochs,
        losses_to_use=cfg["losses_to_use"], alpha=cfg["alpha"],
        cls_to_idx=dcfg["cls_to_idx"], num_classes=dcfg["num_classes"],
        fp_label_threshold=dcfg["fp_label_threshold"],
        triplet_margin=cfg.get("triplet_margin", 0.2),
        triplet_sample_num=cfg.get("triplet_sample_num", 5),
        remat=args.remat,
    )
    trainer = Trainer(model, tx, train_loader, val_loader, runtime, mesh=mesh)

    sample = next(iter(val_loader))
    state = TrainState.create(model, tx, sample,
                              rng=jax.random.PRNGKey(args.seed))
    if args.resume:
        state = trainer.load_checkpoint(state, args.resume)
    elif args.checkpoint:
        state = trainer.load_weights(state, args.checkpoint)
    return trainer, state


def main(argv=None):
    args = parse_args(argv)
    from point_cloud_reid_tpu.configs import get_experiment
    cfg = get_experiment(args.experiment, set_options=args.set_options)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    trainer, state = build_all(cfg, args)
    trainer.logger.log_config(dict(experiment=args.experiment,
                                   seed=args.seed,
                                   schedule=str(cfg["schedule"])))
    if args.eval_only:
        metrics = trainer.evaluate(state)
        print(json.dumps({k: v for k, v in metrics.items()
                          if not isinstance(v, dict)}, indent=1))
        return
    from point_cloud_reid_tpu.utils.profiling import trace_context
    with trace_context(args.profile):
        state = trainer.fit(state)
    metrics = trainer.evaluate(state)
    print(json.dumps({k: v for k, v in metrics.items()
                      if not isinstance(v, dict)}, indent=1))


if __name__ == "__main__":
    main()
