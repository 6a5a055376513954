#!/usr/bin/env python
"""Host data-frontend scale proof at realistic nuScenes-ReID index sizes
(VERDICT r4 item 3): the synthetic stores used by the tests top out at ~2k
objects, while real exports carry tens of thousands of tracks (the reference
builds its TP/FP index arrays over the full export,
reidentification_base.py:202-249, and ValEven enumerates <=10 combos/object,
:361-425). This measures, per index size:

    store_s        SyntheticStore(metadata_only) generation (not framework
                   cost — just the fixture)
    dataset_s      PairDataset construction: TP/FP index + DensityBuckets
    tables_s       _PlanTables flattening (lazy; the vectorized planner's
                   static structure)
    tables_mb      sum of the flattened numpy tables' nbytes
    plan_sps       plan_batch throughput, batch 2048 (pure planning — no IO)
    valeven_s      ValEvenPairs construction (combo enumeration + density-
                   matched negatives) and its pair count
    valarrays_s    frozen-pair-list -> index-array flattening (lazy)

Pure host numpy/python — run under JAX_PLATFORMS=cpu; no device needed.
ValErrPairs is not separately sized: its pair list is derived from an
external tracking-errors JSON, so construction scales with the ERROR count
(input size), not the object index; token/frame resolution goes through the
same _PlanTables lookups measured here.

Usage: python tools/profile_planner_scale.py [SIZE ...]   (default
2000 20000 80000)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _tables_mb(t) -> float:
    total = 0
    for v in t.__dict__.values():
        if isinstance(v, np.ndarray):
            total += v.nbytes
    for entry in t.neg_table.values():
        if entry is not None:
            total += entry[0].nbytes
    return total / 1e6


def main():
    from point_cloud_reid_tpu.data import (PairDataset, SyntheticStore,
                                           ValEvenPairs)

    sizes = [int(s) for s in sys.argv[1:]] or [2000, 20000, 80000]
    classes = [f"class_{i}" for i in range(10)]
    common = dict(classes=classes,
                  cls_to_idx={c: i for i, c in enumerate(classes)},
                  tracking_classes={c: c for c in classes},
                  subsample_sparse=128)

    for n in sizes:
        res = dict(name="planner_scale", objects=n)
        t0 = time.perf_counter()
        store = SyntheticStore(num_objects=n, frames_per_obj=8, seed=1,
                               metadata_only=True)
        res["store_s"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        ds = PairDataset(store=store, seed=0, **common)
        res["dataset_s"] = round(time.perf_counter() - t0, 2)
        res["tp_objects"] = len(ds.tp_tokens)

        t0 = time.perf_counter()
        t = ds._tables()
        res["tables_s"] = round(time.perf_counter() - t0, 2)
        res["tables_mb"] = round(_tables_mb(t), 1)
        res["frames"] = len(t.frame_str)

        B = 2048
        ds.set_epoch(1)
        ds.plan_batch(np.arange(B))                       # warm
        reps = max(4, 2_000_000 // (B * max(n // 2000, 1)))
        t0 = time.perf_counter()
        for r in range(reps):
            ds.plan_batch(np.arange(r * B, (r + 1) * B))
        dt = time.perf_counter() - t0
        res["plan_sps"] = round(reps * B / dt)

        t0 = time.perf_counter()
        val = ValEvenPairs(store=store, validation_seed=0,
                           max_combinations=10, **common)
        res["valeven_s"] = round(time.perf_counter() - t0, 2)
        res["val_pairs"] = len(val)

        t0 = time.perf_counter()
        val._val_arrays()
        res["valarrays_s"] = round(time.perf_counter() - t0, 2)

        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
