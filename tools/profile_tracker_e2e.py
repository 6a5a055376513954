#!/usr/bin/env python
"""Breakdown of the dense end-to-end tracker step (bench.py's
tracker_e2e_256_ms): how much of the tunnel-measured frame is device
compute vs host numpy vs tunnel transfers/RTTs.

Replays the exact bench workload (n_obj objects, 600 pts/object sweeps,
TrackingManager with the DeviceTrackCache), records the per-frame live-track
counts and compiled (t_pad, d_pad, d_prev_pad) buckets, then re-benches the
steady-state cached-frame device program with the honest scalar-fetch sync
(tools/_bench.bench — block_until_ready is a no-op through the axon tunnel)
and times the host-side pieces (sweep padding, gating + greedy association,
lifecycle) in isolation. The residual e2e - device - host is tunnel
transfers + dispatch RTTs, which vanish on locally-attached hardware — so
device+host is the deployment-bound frame time.

Reference claim being sized: "thousands of pairwise comparisons in
real-time (10 Hz)" (README abstract; tracking_point_reid.py:49-118).

Usage: python tools/profile_tracker_e2e.py [N_OBJ=256] [--dense|--sparse]
    --dense forces sparse_scoring='never' (the full-grid kernel) and
    --sparse forces 'always' (gated pair list at any density), for A/B
    against the default 'auto' policy.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench import bench, setup_cache

setup_cache()


def main():
    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.inference import PairScorer
    from point_cloud_reid_tpu.models import build_model
    from point_cloud_reid_tpu.tracking import TrackingManager
    from point_cloud_reid_tpu.tracking.association import (
        associate, center_distance_gate)

    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_obj = int(pos[0]) if pos else 256
    pts_per_obj = 600

    cfg = get_experiment("pts_point-transformer_point-cat_nus_det_4x256_500e")
    model = build_model(cfg["model"], dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    batch = dict(sparse_1=jax.random.normal(rng, (2, 128, 3)),
                 sparse_2=jax.random.normal(rng, (2, 128, 3)),
                 id_1=jnp.zeros((2,), jnp.int32),
                 id_2=jnp.zeros((2,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)

    sparse = ("never" if "--dense" in sys.argv
              else "always" if "--sparse" in sys.argv else "auto")
    scorer = PairScorer(model, variables)
    mgr = TrackingManager(scorer, subsample_number=128,
                          sparse_scoring=sparse)

    # --- replay the bench e2e loop, capturing the last frame's program args
    captured = {}
    orig_fn = mgr._cached_frame_fn
    orig_pair_fn = mgr._cached_pair_frame_fn

    def capturing_fn(t_pad, d_pad, d_prev_pad):
        fn = orig_fn(t_pad, d_pad, d_prev_pad)

        def wrapped(*args):
            captured["key"] = (t_pad, d_pad, d_prev_pad)
            captured["args"] = args
            captured["jitted"] = fn.jitted
            return fn(*args)
        return wrapped

    def capturing_pair_fn(t_pad, d_pad, d_prev_pad, p_pad):
        fn = orig_pair_fn(t_pad, d_pad, d_prev_pad, p_pad)

        def wrapped(*args):
            captured["key"] = (t_pad, d_pad, d_prev_pad, p_pad)
            captured["args"] = args
            captured["jitted"] = fn.jitted
            return fn(*args)
        return wrapped

    mgr._cached_frame_fn = capturing_fn
    mgr._cached_pair_frame_fn = capturing_pair_fn

    rs = np.random.RandomState(0)
    centers = (rs.rand(n_obj, 3) * 40 - 20).astype(np.float32)
    centers[:, 2] = 0.0
    times, live = [], []
    for _ in range(10):
        centers += rs.randn(n_obj, 3).astype(np.float32) * 0.2
        boxes = np.concatenate(
            [centers, np.full((n_obj, 3), 2.0, np.float32),
             np.zeros((n_obj, 1), np.float32)], axis=1)
        pts = (np.repeat(centers, pts_per_obj, axis=0)
               + rs.randn(n_obj * pts_per_obj, 3).astype(np.float32) * 0.5)
        t0 = time.perf_counter()
        mgr.step(pts, boxes, np.ones(n_obj, np.float32),
                 np.zeros(n_obj, np.int64))
        times.append(time.perf_counter() - t0)
        live.append(len(mgr.store.active()))
    e2e_ms = float(np.median(times[3:]) * 1e3)
    print(json.dumps(dict(
        name="e2e_tunnel", n_obj=n_obj, ms=round(e2e_ms, 1),
        sparse_scoring=sparse, live_tracks_per_frame=live,
        buckets=sorted(mgr._cached_frame_fns.keys()),
        pair_buckets=sorted(mgr._cached_pair_frame_fns.keys()))), flush=True)

    # --- device program at the steady-state bucket, honest sync
    key = captured["key"]
    t_pad, d_pad, d_prev_pad = key[:3]
    dev_s, _ = bench(f"cached_frame_dev {'x'.join(map(str, key))}",
                     captured["jitted"], (variables,) + captured["args"],
                     jit=False, sync=lambda out: out[2])

    # --- host pieces, timed in isolation (pure numpy, synchronous)
    sweep = np.asarray(pts, np.float32)
    from point_cloud_reid_tpu.inference.pair_scoring import _round_up
    from point_cloud_reid_tpu.tracking.manager import SWEEP_SIZES
    n_pad = _round_up(len(sweep), sizes=SWEEP_SIZES)
    t0 = time.perf_counter()
    reps = 50
    for _ in range(reps):
        padded = np.full((n_pad, 3), 1e6, np.float32)
        padded[:len(sweep)] = sweep[:, :3]
    pad_ms = (time.perf_counter() - t0) / reps * 1e3

    T = live[-1]
    cost = rs.rand(T, n_obj)
    pred = np.concatenate([
        (rs.rand(T, 3) * 40 - 20).astype(np.float32),
        np.full((T, 3), 2.0, np.float32), np.zeros((T, 1), np.float32)],
        axis=1)
    t0 = time.perf_counter()
    for _ in range(reps):
        gate = center_distance_gate(pred, boxes, 2.0)
        associate(cost, threshold=0.7, method="greedy", gate=gate)
    assoc_ms = (time.perf_counter() - t0) / reps * 1e3

    up_mb = (n_pad * 3 * 4 + d_pad * 7 * 4 + (t_pad + 2 * d_prev_pad) * 4) / 1e6
    down_mb = (key[3] * 4 if len(key) == 4 else t_pad * d_pad * 4) / 1e6
    host_ms = pad_ms + assoc_ms
    residual = e2e_ms - dev_s * 1e3 - host_ms
    print(json.dumps(dict(
        name="breakdown", n_obj=n_obj,
        e2e_tunnel_ms=round(e2e_ms, 1),
        device_ms=round(dev_s * 1e3, 1),
        host_pad_ms=round(pad_ms, 2), host_assoc_ms=round(assoc_ms, 2),
        tunnel_residual_ms=round(residual, 1),
        upload_mb=round(up_mb, 2), download_mb=round(down_mb, 2),
        device_bound_frame_ms=round(dev_s * 1e3 + host_ms, 1),
        device_bound_hz=round(1e3 / (dev_s * 1e3 + host_ms), 1))),
        flush=True)


if __name__ == "__main__":
    main()
