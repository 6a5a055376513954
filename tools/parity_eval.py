#!/usr/bin/env python
"""Turnkey checkpoint-parity harness: released .pth -> accuracy delta.

One command chains every parity piece — torch-checkpoint conversion, (imported)
crop store, frozen seeded val pairs, the stratified evaluator — and prints the
accuracy delta against the BASELINE.md bar (+/-0.5% of the released
checkpoint's accuracy). This is the reference's eval protocol
(launcher_testing.py:14-53 enumerates checkpoint x testing_* config pairs;
configs_reid/reid_nuscenes_pts/testing_base.py:8-18 sets the seeded
point-count-matched val set) as a single turnkey invocation.

Real-data run (the day the released downloads are on disk):

    python tools/import_reference_store.py --metadata .../metadata.pkl \
        --data-root data/lstk/sparse-trainval-det-both \
        --instance-token-to-id data/lstk/instance_token_to_id.pkl
    python tools/parity_eval.py \
        testing_pts_point-transformer_point-cat_nus_det_4x256_500e \
        --pth checkpoints/pts_point-transformer_r_nus_det.pth \
        --data-root data/lstk/sparse-trainval-det-both \
        --expected-acc <released accuracy in %>

Dry-runnable today end-to-end with a synthetic store (omit --data-root) and a
torch-replica checkpoint (tests/test_parity_eval.py builds one).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("experiment", help="a testing_* experiment name")
    p.add_argument("--pth", default=None,
                   help="released torch checkpoint (.pth) to convert + eval")
    p.add_argument("--ckpt", default=None,
                   help="already-converted orbax checkpoint dir (alternative "
                        "to --pth)")
    p.add_argument("--data-root", default=None,
                   help="imported crop store (tools/import_reference_store."
                        "py); synthetic data when omitted (dry run)")
    p.add_argument("--pairs", default=None,
                   help="frozen val-pair artifact (tools/dump_val_pairs.py) — "
                        "replay the EXACT pair list instead of reseeding")
    p.add_argument("--expected-acc", type=float, default=None,
                   help="released checkpoint's accuracy in %% (the parity "
                        "target)")
    p.add_argument("--tolerance", type=float, default=0.5,
                   help="accuracy bar in %% points (BASELINE.md: 0.5)")
    p.add_argument("--image", action="store_true",
                   help="image-branch checkpoint conversion")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--seed", type=int, default=66)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--synthetic-objects", type=int, default=60)
    p.add_argument("--set", dest="set_options", action="append", default=[],
                   metavar="KEY.PATH=VALUE")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if not (args.pth or args.ckpt):
        raise SystemExit("one of --pth / --ckpt is required")

    from train import build_all  # tools/train.py
    from point_cloud_reid_tpu.configs import get_experiment

    cfg = get_experiment(args.experiment, set_options=args.set_options)
    if not cfg["runtime"].get("eval_only"):
        print("note: experiment is not a testing_* leaf; evaluating anyway",
              file=sys.stderr)

    # reuse the train CLI's builder for store/datasets/model/trainer
    train_args = argparse.Namespace(
        experiment=args.experiment, root=args.data_root,
        work_dir=args.work_dir, checkpoint=None, resume=None, profile=None,
        seed=args.seed, epochs=None, batch_size=args.batch_size,
        eval_only=True, synthetic_objects=args.synthetic_objects,
        remat=False, bf16=False, set_options=args.set_options)
    trainer, state = build_all(cfg, train_args)

    # ---- checkpoint: torch .pth conversion or orbax load --------------------
    if args.pth:
        from point_cloud_reid_tpu.convert import (
            convert_reidnet_state_dict, load_torch_state_dict)
        from point_cloud_reid_tpu.convert.torch_checkpoint import (
            convert_image_reidnet_state_dict)
        sd = load_torch_state_dict(args.pth)
        convert = (convert_image_reidnet_state_dict if args.image
                   else convert_reidnet_state_dict)
        variables, report = convert(sd, state.variables, strict=True)
        print(f"converted {args.pth}: {len(sd)} torch tensors, "
              f"{len(report['unmatched_torch'])} unmatched",
              file=sys.stderr)
        state = state.replace(params=variables["params"],
                              batch_stats=variables.get("batch_stats", {}))
    else:
        state = trainer.load_weights(state, args.ckpt)

    # ---- frozen val pairs (cross-framework protocol) ------------------------
    if args.pairs:
        from point_cloud_reid_tpu.data import BatchLoader, ValEvenPairs
        with open(args.pairs) as f:
            pairs = json.load(f)
        old = trainer.val_loader.dataset
        val_ds = ValEvenPairs.from_artifact(
            pairs, store=old.store, classes=old.classes,
            cls_to_idx=old.cls_to_idx, tracking_classes=old.tracking_classes,
            complete_store=old.complete_store,
            subsample_sparse=old.subsample_sparse,
            subsample_dense=old.subsample_dense, mode=old.mode,
            with_dense=old.with_dense)
        trainer.val_loader = BatchLoader(
            val_ds, batch_size=trainer.val_loader.batch_size, shuffle=False,
            drop_last=True)
        print(f"replaying frozen pair list: {len(val_ds)} pairs",
              file=sys.stderr)

    metrics = trainer.evaluate(state)
    acc = 100.0 * float(metrics["val_match_acc"])

    out = dict(experiment=args.experiment,
               checkpoint=args.pth or args.ckpt,
               val_match_acc_pct=round(acc, 3),
               expected_acc_pct=args.expected_acc,
               tolerance_pct=args.tolerance)
    if args.expected_acc is not None:
        delta = acc - args.expected_acc
        out.update(delta_pct=round(delta, 3),
                   parity=bool(abs(delta) <= args.tolerance))
    if args.work_dir:
        os.makedirs(args.work_dir, exist_ok=True)
        with open(os.path.join(args.work_dir, "parity_report.json"),
                  "w") as f:
            json.dump(dict(out, full_metrics={
                k: v for k, v in metrics.items()
                if not isinstance(v, dict)}), f, indent=1)
    print(json.dumps(out, indent=1))
    if args.expected_acc is not None and not out["parity"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
