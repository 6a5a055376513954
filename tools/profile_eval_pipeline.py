#!/usr/bin/env python
"""Measure Trainer.evaluate pipelining on the real TPU (VERDICT r4 item 5).

The pre-round-4 evaluate fetched results after every val batch
(`jax.device_get` in the loop) — through the ~40 ms-RTT axon tunnel that
serializes ~2 RTTs per 512-pair batch on top of compute, which dominates the
500e run's 20 eval epochs. The queue-then-drain window (`eval_prefetch`)
overlaps dispatch with device compute. This tool times a full eval epoch at
window=1 (the old behavior) vs the default window and checks the metrics are
identical.

    python tools/profile_eval_pipeline.py [n_objects]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _bench import setup_cache

setup_cache()


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train import build_all

    from point_cloud_reid_tpu.configs import get_experiment

    n_obj = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    cfg = get_experiment("pts_point-transformer_point-cat_nus_det_4x256_500e")
    args = argparse.Namespace(
        root=None, synthetic_objects=n_obj, batch_size=None, seed=0,
        bf16=True, epochs=1, work_dir="/tmp/eval_pipeline", resume=None,
        checkpoint=None, remat=False)
    trainer, state = build_all(cfg, args)
    n_batches = len(trainer.val_loader)

    results = {}
    for window in (1, 8):
        trainer.cfg["eval_prefetch"] = window
        trainer.evaluate(state)                      # warm: compile + cache
        t0 = time.perf_counter()
        res = trainer.evaluate(state)
        dt = time.perf_counter() - t0
        results[window] = (dt, res)
        print(json.dumps(dict(window=window, eval_epoch_s=round(dt, 2),
                              n_batches=n_batches,
                              ms_per_batch=round(dt / n_batches * 1e3, 1))),
              flush=True)

    scalars1 = {k: v for k, v in results[1][1].items()
                if isinstance(v, (int, float))}
    scalars8 = {k: v for k, v in results[8][1].items()
                if isinstance(v, (int, float))}
    assert scalars1 == scalars8, "pipelined eval changed results!"
    print(json.dumps(dict(speedup=round(results[1][0] / results[8][0], 2),
                          results_identical=True)), flush=True)


if __name__ == "__main__":
    main()
