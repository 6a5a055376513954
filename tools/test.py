#!/usr/bin/env python
"""Standalone evaluation CLI.

TPU-native equivalent of the reference test entry (tools/test.py:25-120 /
running train.py with a testing_* config, SURVEY.md §4.1): loads a checkpoint
and runs the stratified evaluator, writing the full nested JSON report.

    python tools/test.py <experiment> --checkpoint <orbax-dir> \
        [--root <crop-store>] [--work-dir out/]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from train import build_all, parse_args  # noqa: E402  (tools/train.py)


def main(argv=None):
    args = parse_args(argv)
    args.eval_only = True
    from point_cloud_reid_tpu.configs import get_experiment
    cfg = get_experiment(args.experiment, set_options=args.set_options)
    trainer, state = build_all(cfg, args)
    metrics = trainer.evaluate(state)
    out_path = os.path.join(args.work_dir or ".", "eval_results_full.json")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps({k: v for k, v in metrics.items()
                      if not isinstance(v, dict)}, indent=1))
    print(f"full report: {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
