#!/usr/bin/env python
"""Num-point-ablation step-time table on real TPU (VERDICT r4 item 2).

The reference's num_point_ablation configs train the same backbone at
160..2048 input points (configs_reid/reid_waymo_pts/num_point_ablation/*,
reid_nuscenes_pts/num_point_ablation/*); SURVEY §7 hard part 3 flags the
O(N²) kNN distance matrices at 2048 pts x large batch as a risk shape that
had never been timed on hardware. This tool prints one JSON line per point
count for the flagship train step (B=256 by default):

    python tools/profile_ablation.py [B] [--pts 128,160,256,512,1024,2048]
                                     [--remat] [--gather]

On HBM OOM at a given N it retries with remat=True (jax.checkpoint around
the loss — make_train_step docstring has the measured cost), then with B/2,
and reports which fallback was used.

--gather: instead of the step table, A/B the one-hot-matmul vs native gather
paths of ops.geometry.index_points at the N=2048 SA1 train shapes, to verify
the auto-guard's crossover claim (ops/geometry.py: one-hot goes
compute-bound past N~2048 where native catches up).
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


def _flagship_model(dtype=jnp.bfloat16):
    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.models import build_model
    cfg = get_experiment(
        "pts_point-transformer_point-cat_waymo_det_4x256_400e_2048pts")
    return build_model(cfg["model"], dtype=dtype)


def _batch(B: int, N: int):
    rng = jax.random.PRNGKey(0)
    return dict(
        sparse_1=jax.random.normal(rng, (B, N, 3)),
        sparse_2=jax.random.normal(jax.random.PRNGKey(1), (B, N, 3)),
        label_1=jnp.zeros((B,), jnp.int32),
        label_2=(jnp.arange(B, dtype=jnp.int32) % 2),
        id_1=jnp.arange(B, dtype=jnp.int32),
        id_2=jnp.arange(B, dtype=jnp.int32) % 7,
    )


def _time_step(model, B: int, N: int, remat: bool):
    from point_cloud_reid_tpu.train import (TrainState, build_optimizer,
                                            make_train_step)
    from point_cloud_reid_tpu.train.schedules import ScheduleConfig
    batch = _batch(B, N)
    tx = build_optimizer(ScheduleConfig(max_epochs=1), steps_per_epoch=100)
    state = TrainState.create(model, tx, batch, rng=jax.random.PRNGKey(2))
    step = make_train_step(model, tx, losses_to_use=dict(
        match=True, kl=True, triplet=True), alpha={}, donate=False,
        remat=remat)
    dt, _ = bench(f"train_step_B{B}_N{N}" + ("_remat" if remat else ""),
                  step, (state, batch, jax.random.PRNGKey(3)),
                  sync=lambda out: out[1]["reid_loss"])
    return dt


def step_table(B: int, pts, force_remat: bool):
    model = _flagship_model()
    rows = []
    for N in pts:
        row = dict(N=N, B=B, remat=force_remat)
        tried = ([(B, True)] if force_remat
                 else [(B, False), (B, True), (B // 2, True)])
        for b, remat in tried:
            try:
                dt = _time_step(model, b, N, remat)
                row.update(B=b, remat=remat, ms=round(dt * 1e3, 2),
                           samples_per_sec=round(b / dt, 1))
                break
            except Exception as e:  # noqa: BLE001 — OOM/RESOURCE_EXHAUSTED
                row["fallback_from"] = row.get("fallback_from", []) + [
                    f"B{b}{'_remat' if remat else ''}: {str(e)[:80]}"]
        rows.append(row)
        print("ROW " + json.dumps(row), flush=True)
    print("TABLE " + json.dumps(rows), flush=True)


def gather_ab():
    """index_points one-hot vs native at SA1 shapes across N (fwd + vjp)."""
    from functools import partial

    from point_cloud_reid_tpu.ops import geometry as G
    B, K, C = 512, 128 * 32, 3  # SA1 grouping at the siamese train batch
    for N in (512, 1024, 2048, 4096, 8192):
        pts = jax.random.normal(jax.random.PRNGKey(0), (B, N, C))
        idx = jax.random.randint(jax.random.PRNGKey(1), (B, K), 0, N)
        for method in ("onehot", "native"):
            fn = partial(G.index_points, method=method)
            bench(f"gather_{method}_N{N}_fwd", fn, (pts, idx))

            def vjp_fn(p, i, fn=fn):
                out, pull = jax.vjp(lambda q: fn(q, i), p)
                return pull(jnp.ones_like(out))[0]
            bench(f"gather_{method}_N{N}_vjp", vjp_fn, (pts, idx))


def main():
    argv = sys.argv[1:]
    pts = [128, 160, 256, 512, 1024, 2048]
    flag_values = set()
    for i, a in enumerate(argv):
        if a == "--pts":
            pts = [int(x) for x in argv[i + 1].split(",")]
            flag_values.add(i + 1)
    pos = [a for i, a in enumerate(argv)
           if not a.startswith("--") and i not in flag_values]
    B = int(pos[0]) if pos else 256
    if "--gather" in sys.argv:
        gather_ab()
    else:
        step_table(B, pts, force_remat="--remat" in sys.argv)


if __name__ == "__main__":
    main()
