#!/usr/bin/env python
"""Serialized multi-run driver.

Equivalent of the reference launcher_training.py / launcher_testing.py
(:53-80): runs a list of (experiment, extra-args) jobs back to back, logging
per-run status. Where the reference shells out `torchpack dist-run -np N`,
one process here drives all chips via SPMD — jobs differ only in experiment
name and flags.

    python tools/launcher.py --jobs jobs.json [--dry-run]

jobs.json: [{"experiment": "...", "args": ["--epochs", "2"]}, ...]
With no --jobs, runs the released training matrix (point models on nuScenes).
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
import os

DEFAULT_JOBS = [
    {"experiment": "pts_point-transformer_point-cat_nus_det_4x256_500e",
     "args": []},
    {"experiment": "pts_pointnet_point-cat_nus_det_4x256_500e", "args": []},
    {"experiment": "pts_dgcnn_point-cat_nus_det_4x256_500e", "args": []},
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", default=None, help="JSON job list")
    ap.add_argument("--tool", default="train.py", choices=["train.py", "test.py"])
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--stop-on-error", action="store_true")
    args = ap.parse_args(argv)

    jobs = DEFAULT_JOBS
    if args.jobs:
        with open(args.jobs) as f:
            jobs = json.load(f)

    here = os.path.dirname(os.path.abspath(__file__))
    results = []
    for job in jobs:
        cmd = [sys.executable, os.path.join(here, args.tool),
               job["experiment"], *job.get("args", [])]
        print(f"[launcher] {' '.join(cmd)}", file=sys.stderr)
        if args.dry_run:
            results.append(dict(job=job, status="dry-run"))
            continue
        t0 = time.time()
        proc = subprocess.run(cmd)
        results.append(dict(job=job, status="ok" if proc.returncode == 0
                            else f"exit {proc.returncode}",
                            seconds=round(time.time() - t0, 1)))
        if proc.returncode != 0 and args.stop_on_error:
            break
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
