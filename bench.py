#!/usr/bin/env python
"""Headline benchmark: Siamese pairwise comparisons/sec/chip (+ secondary
train/tracker/input-pipeline metrics and an MFU estimate).

Measures the reference's real-time tracking workload (SURVEY.md §3.5 /
BASELINE.json): per frame, embed new detections once (amortized backbone),
then score the full tracks x detections grid through the cross-attention match
head. The reference achieves "thousands of pairwise comparisons in real-time
(10 Hz)" on GPU via a per-pair gather loop; here the grid is one fused batched
XLA program. Target: >= 100k pairs/s on v5e-8 == 12.5k pairs/s/chip.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", "secondary"}.
The headline fields are unchanged from round 1; "secondary" adds:
  tracker_frame_ms          pipelined ms/frame of the fused tracking frame
                            (the headline loop — dispatch amortized)
  tracker_frame_ms_sync     one-shot latency incl. a full host round-trip
  train_step_ms / train_samples_per_sec
                            flagship train step, B=256 N=128 bf16, one chip
  train_mfu                 XLA-counted train-step FLOPs / chip peak bf16
  input_pipeline_samples_per_sec
                            BatchLoader over an on-disk store (native C++
                            batched reads), batch 2048
  input_vs_train_step       input throughput / train-step throughput (>1 =
                            the loader keeps the chip fed)
  tracker_e2e_ms            full TrackingManager.step median (96 objects,
                            57.6k-pt sweeps, DeviceTrackCache, 'auto' gated
                            sparse scoring; includes the per-frame tunnel
                            RTTs in this environment)
  tracker_e2e_256_ms        same at Waymo density: 256 objects, 153.6k-pt
                            sweeps, 131k-pair padded grid per frame —
                            'auto' gated SPARSE scoring applies here (only
                            the ~1k class+BEV gate survivors are scored;
                            tracker_e2e_256_sparse records that it ran)
  image_frame_ms / image_pairs_per_sec_per_chip
                            DeiT-tiny image-branch frame, 64x64 grid incl.
                            embedding the 64 224x224 crops
  image_train_step_ms / image_train_samples_per_sec
                            DeiT-tiny train step at the reference's 4x60
                            image training scale (B=60/chip, full loss set)
Secondary metrics are best-effort: any that fail record null rather than
killing the headline.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# big programs take minutes to compile through the axon tunnel; persist them
os.makedirs("/root/.cache/jax_comp_tpu", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TARGET_PER_CHIP = 100_000 / 8   # BASELINE.json: 100k pairs/s on v5e-8

# peak dense bf16 FLOP/s per chip by device_kind substring (public figures)
_PEAK_BF16 = [
    ("v6", 918e12), ("v5p", 459e12), ("v5 lite", 197e12), ("v5e", 197e12),
    ("v4", 275e12), ("v3", 123e12), ("v2", 45e12),
]


def _peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in _PEAK_BF16:
        if sub in kind:
            return peak
    return None


def _sync(x) -> float:
    """TRUE device sync: fetch a scalar that depends on x.

    jax.block_until_ready is a no-op through this environment's axon tunnel
    (calibrated: 4.4 TFLOP of chained bf16 matmuls "completes" in 0.15 ms =
    150x chip peak under block_until_ready, vs 9.7 ms = 58% of v5e peak under
    a scalar fetch). Every timing here queues n executions and then fetches
    one scalar off the LAST program — the TPU stream is FIFO, so that fetch
    waits for all queued work, and the single ~40 ms tunnel RTT amortizes
    over n.
    """
    return float(jnp.sum(x))


def _compile(jitted, *args):
    """AOT-compile once; return (executable, flops). The executable is used
    for the timing loops too, so the slow tunnel compile happens ONCE."""
    import sys
    compiled = jitted.lower(*args).compile()
    flops = None
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass
    print(f"compiled {getattr(jitted, '__name__', 'fn')}: flops={flops}",
          file=sys.stderr)
    return compiled, flops


def _bench_tracker(model, variables):
    """Headline: fused frame (embed dets + NxM grid) pairs/s/chip."""
    from point_cloud_reid_tpu.inference import PairScorer

    # tracking-frame scale: 128 live tracks x 128 detections, 128-pt crops
    # (dense-scene nuScenes frame; per-frame cost is embed(dets) + full grid)
    NT, ND, NPTS = 128, 128, 128
    scorer = PairScorer(model, variables)
    dets = jax.random.normal(jax.random.PRNGKey(2), (ND, NPTS, 3))
    tracks = jax.random.normal(jax.random.PRNGKey(3), (NT, NPTS, 3))
    xyz_t, h_t = scorer.embed(tracks)
    frame_fn = scorer.make_frame_fn(NT, ND)

    frame_x, flops = _compile(frame_fn.jitted, variables, h_t, xyz_t, dets)
    if scorer._use_pallas:
        # XLA's cost analysis cannot see inside the pallas match-grid kernel;
        # take the FLOP count from the equivalent XLA-backend frame program
        # (compiled for counting only, persisted in the compile cache).
        xla_frame = PairScorer(model, variables,
                               backend="xla").make_frame_fn(NT, ND)
        _, flops = _compile(xla_frame.jitted, variables, h_t, xyz_t, dets)
    _sync(frame_x(variables, h_t, xyz_t, dets)[0])   # warm

    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        mat, _, _ = frame_x(variables, h_t, xyz_t, dets)
    _sync(mat)                                # waits for ALL queued frames
    dt = time.perf_counter() - t0

    # one-shot latency: full dispatch + device + fetch round trip per frame
    t1 = time.perf_counter()
    for _ in range(5):
        _sync(frame_x(variables, h_t, xyz_t, dets)[0])
    sync_ms = (time.perf_counter() - t1) / 5 * 1e3

    pairs_per_sec = NT * ND * n_iters / dt
    mfu = None
    peak = _peak_flops()
    if flops and peak:
        mfu = flops / (dt / n_iters) / peak

    # Waymo-scale dense frame: 256 tracks x 256 dets = 65k pairs (best-effort)
    big = None
    try:
        NT2 = ND2 = 256
        dets2 = jax.random.normal(jax.random.PRNGKey(4), (ND2, NPTS, 3))
        tracks2 = jax.random.normal(jax.random.PRNGKey(5), (NT2, NPTS, 3))
        xyz_t2, h_t2 = scorer.embed(tracks2)
        frame2 = scorer.make_frame_fn(NT2, ND2)
        _sync(frame2(h_t2, xyz_t2, dets2)[0])
        t2 = time.perf_counter()
        for _ in range(10):
            mat2, _, _ = frame2(h_t2, xyz_t2, dets2)
        _sync(mat2)
        big = (time.perf_counter() - t2) / 10 * 1e3
    except Exception:
        pass
    return pairs_per_sec, dt / n_iters * 1e3, sync_ms, mfu, big


def _bench_train_step(model):
    """Flagship train step: ms/step, samples/s, MFU estimate."""
    from point_cloud_reid_tpu.train import (TrainState, build_optimizer,
                                            make_train_step)
    from point_cloud_reid_tpu.train.schedules import ScheduleConfig

    B, N = 256, 128
    rng = jax.random.PRNGKey(0)
    batch = dict(
        sparse_1=jax.random.normal(rng, (B, N, 3)),
        sparse_2=jax.random.normal(jax.random.PRNGKey(1), (B, N, 3)),
        label_1=jnp.zeros((B,), jnp.int32),
        label_2=(jnp.arange(B, dtype=jnp.int32) % 2),
        id_1=jnp.arange(B, dtype=jnp.int32),
        id_2=jnp.arange(B, dtype=jnp.int32) % 7,
    )
    tx = build_optimizer(ScheduleConfig(max_epochs=1), steps_per_epoch=100)
    state = TrainState.create(model, tx, batch, rng=jax.random.PRNGKey(2))
    step = make_train_step(model, tx,
                           losses_to_use=dict(match=True, kl=True,
                                              triplet=True),
                           alpha={}, donate=False)

    step_x, flops = _compile(step, state, batch, jax.random.PRNGKey(3))
    state, log = step_x(state, batch, jax.random.PRNGKey(3))   # warm
    _sync(log["reid_loss"])
    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, log = step_x(state, batch, jax.random.PRNGKey(4))
    _sync(log["reid_loss"])    # chained states -> waits for all 20 steps
    dt = (time.perf_counter() - t0) / n_iters

    mfu = None
    peak = _peak_flops()
    if flops and peak:
        mfu = flops / dt / peak
    return dt * 1e3, B / dt, mfu


def _bench_image_frame():
    """Image-branch frame (PARITY claim: DeiT-tiny, 64 tracks x 64 dets
    including embedding the 64 224x224 crops through the ViT, hoisted
    CrossLinAttn grid). Weights are random — identical FLOPs/throughput to
    converted weights."""
    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.inference import PairScorer
    from point_cloud_reid_tpu.models import build_model

    cfg = get_experiment("rgb_deit-tiny_point-cat_r_nus_det_4x60_200e")
    model = build_model(cfg["model"], dtype=jnp.bfloat16)
    NT = ND = 64
    crops = jax.random.normal(jax.random.PRNGKey(0), (ND, 3, 224, 224))
    # image batches keep the reference's sparse_1/sparse_2 key names
    # (ImageReIDNet.__call__, models/image_reid.py)
    batch = dict(sparse_1=crops[:2], sparse_2=crops[:2],
                 id_1=jnp.zeros((2,), jnp.int32),
                 id_2=jnp.zeros((2,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)

    def build_frame(backend):
        scorer = PairScorer(model, variables, image_mode=True,
                            backend=backend)
        _, h_t = scorer.embed(crops)              # (NT, S, C) downsampled
        frame_fn = scorer.make_frame_fn(NT, ND)
        frame_x, _ = _compile(frame_fn.jitted, variables, h_t, None, crops)
        _sync(frame_x(variables, h_t, None, crops)[0])
        # record the backend the scorer actually ROUTED, not the request —
        # a silent pallas-eligibility regression under 'auto' must show up
        # in the driver artifact
        return frame_x, h_t, scorer._grid_backend(ND)

    kernel_error = None
    try:
        frame_x, h_t, backend_used = build_frame("auto")   # pallas on TPU
    except Exception as e:
        # never lose the metric to a kernel regression — fall back to the
        # XLA grid, but RECORD the failure so the driver artifact shows it
        kernel_error = str(e)[:120]
        frame_x, h_t, _ = build_frame("xla")
        backend_used = "xla-fallback"
    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        mat, _, _ = frame_x(variables, h_t, None, crops)
    _sync(mat)
    dt = (time.perf_counter() - t0) / n_iters
    return dt * 1e3, NT * ND / dt, backend_used, kernel_error


def _install_frame_capture(mgr, captured):
    """Wrap the manager's cached-frame-program getters so the LAST dispatched
    steady-state frame's jitted program + args are captured for honest
    device-time re-timing (tools/profile_tracker_e2e.py's method, folded
    into the driver artifact per VERDICT r4 item 2)."""
    names = ["_cached_frame_fn", "_cached_pair_frame_fn",
             "_cached_image_frame_fn", "_cached_image_pair_frame_fn"]
    for name in names:
        if not hasattr(mgr, name):
            continue
        orig = getattr(mgr, name)

        def make(orig, name):
            def getter(*key):
                fn = orig(*key)

                def wrapped(*args):
                    captured["name"] = name
                    captured["args"] = args
                    captured["jitted"] = fn.jitted
                    return fn(*args)
                return wrapped
            return getter
        setattr(mgr, name, make(orig, name))


_LOGIT_IDX = {"_cached_frame_fn": 2, "_cached_pair_frame_fn": 2,
              "_cached_image_frame_fn": 1, "_cached_image_pair_frame_fn": 1}


def _time_captured_device(captured, variables, n: int = 20) -> float:
    """Honest device ms of the captured frame program: queue n executions,
    scalar-fetch the last logits (block_until_ready is a no-op through the
    axon tunnel — see _sync)."""
    jitted, args = captured["jitted"], captured["args"]
    idx = _LOGIT_IDX[captured["name"]]
    out = jitted(variables, *args)
    _sync(out[idx])
    t0 = time.perf_counter()
    for _ in range(n):
        out = jitted(variables, *args)
    _sync(out[idx])
    return (time.perf_counter() - t0) / n * 1e3


def _host_pieces_ms(n_tracks: int, n_dets: int, det_boxes, sweep=None,
                    reps: int = 50) -> float:
    """Host-side numpy cost of a tracker frame, timed in isolation: sweep
    bucket-padding (point mode only) + class/BEV gating + greedy
    association. The e2e residual beyond device+host is tunnel
    transfers/RTTs, which vanish on locally-attached hardware."""
    from point_cloud_reid_tpu.inference.pair_scoring import _round_up
    from point_cloud_reid_tpu.tracking.association import (
        associate, center_distance_gate)
    from point_cloud_reid_tpu.tracking.manager import SWEEP_SIZES
    rs = np.random.RandomState(1)
    total = 0.0
    if sweep is not None:
        sweep = np.asarray(sweep, np.float32)
        # same bucket ladder as TrackingManager.step's sweep padding
        n_pad = _round_up(max(len(sweep), 1), sizes=SWEEP_SIZES)
        t0 = time.perf_counter()
        for _ in range(reps):
            padded = np.full((n_pad, 3), 1e6, np.float32)
            padded[:len(sweep)] = sweep[:, :3]
        total += (time.perf_counter() - t0) / reps * 1e3
    T = max(n_tracks, 1)
    cost = rs.rand(T, n_dets)
    pred = np.concatenate([
        (rs.rand(T, 3) * 40 - 20).astype(np.float32),
        np.full((T, 3), 2.0, np.float32), np.zeros((T, 1), np.float32)],
        axis=1)
    det_boxes = np.asarray(det_boxes, np.float32)
    t0 = time.perf_counter()
    for _ in range(reps):
        gate = center_distance_gate(pred, det_boxes, 2.0)
        associate(cost, threshold=0.7, method="greedy", gate=gate)
    total += (time.perf_counter() - t0) / reps * 1e3
    return total


def _bench_tracker_e2e(model, variables, n_obj: int = 96,
                       pts_per_obj: int = 600):
    """End-to-end TrackingManager.step with the DeviceTrackCache (PARITY
    claim at 96 objects / 57.6k-point sweeps: crops + embed + grid + greedy
    association + lifecycle — ~229 ms/frame through the tunnel, ~45-50 ms
    device-bound locally). n_obj=256 is the Waymo-dense check for the
    reference's "thousands of pairwise comparisons in real-time (10 Hz)"
    claim (README abstract; tracking_point_reid.py:49-118) — 65k pairs
    scored per frame end-to-end. Median over steady-state frames; the
    per-frame logits fetch makes each step naturally synchronous."""
    from point_cloud_reid_tpu.inference import PairScorer
    from point_cloud_reid_tpu.tracking import TrackingManager

    rs = np.random.RandomState(0)
    sweep_pts = n_obj * pts_per_obj
    scorer = PairScorer(model, variables)
    mgr = TrackingManager(scorer, subsample_number=128)
    _bench_tracker_e2e.last_mgr = mgr      # expose: did sparse scoring run?
    captured = {}
    _install_frame_capture(mgr, captured)
    centers = (rs.rand(n_obj, 3) * 40 - 20).astype(np.float32)
    centers[:, 2] = 0.0
    per_obj = sweep_pts // n_obj
    times = []
    for _ in range(10):
        centers += rs.randn(n_obj, 3).astype(np.float32) * 0.2
        boxes = np.concatenate(
            [centers, np.full((n_obj, 3), 2.0, np.float32),
             np.zeros((n_obj, 1), np.float32)], axis=1)
        pts = (np.repeat(centers, per_obj, axis=0)
               + rs.randn(n_obj * per_obj, 3).astype(np.float32) * 0.5)
        t0 = time.perf_counter()
        mgr.step(pts, boxes, np.ones(n_obj, np.float32),
                 np.zeros(n_obj, np.int64))
        times.append(time.perf_counter() - t0)
    e2e_ms = float(np.median(times[3:]) * 1e3)
    # device/host/tunnel split of the steady-state frame (the deployment-
    # bound number is device+host; the residual is tunnel RTT/transfer)
    breakdown = None
    if captured:
        dev_ms = _time_captured_device(captured, variables)
        host_ms = _host_pieces_ms(len(mgr.store.active()), n_obj, boxes,
                                  sweep=pts)
        breakdown = dict(device_ms=round(dev_ms, 1),
                         host_ms=round(host_ms, 1),
                         tunnel_ms=round(e2e_ms - dev_ms - host_ms, 1),
                         device_bound_hz=round(1e3 / (dev_ms + host_ms), 1))
    # first frames pay compilation; report the steady-state median
    return e2e_ms, breakdown


def camera_ring():
    """6-camera ring (nuScenes geometry: 1600x900, ~60 deg spacing) —
    (lidar2cams (6, 4, 4), intrinsics (6, 3, 3)). Single source for the
    image-tracker e2e bench and its piece-wise dissection
    (tools/profile_image_frame_pieces.py) so both measure one workload."""
    l2cs, Ks = [], []
    for k in range(6):
        a = k * np.pi / 3
        fwd = np.array([np.cos(a), np.sin(a), 0.0])
        right = np.array([np.sin(a), -np.cos(a), 0.0])
        down = np.array([0.0, 0.0, -1.0])
        R = np.stack([right, down, fwd])
        l2c = np.eye(4, dtype=np.float32)
        l2c[:3, :3] = R
        l2cs.append(l2c)
        Ks.append(np.array([[800, 0, 800], [0, 800, 450], [0, 0, 1]],
                           np.float32))
    return np.stack(l2cs), np.stack(Ks)


def _bench_image_tracker_e2e(n_obj: int = 64):
    """End-to-end IMAGE-branch TrackingManager.step on the fused deployment
    path (VERDICT r4 item 1): per frame, ONE device program projects the 3D
    boxes into 6 nuScenes-geometry 1600x900 cameras, bilinear-crops the best
    view per box, embeds the crops through DeiT-tiny, and scores the grid
    against the DeviceTrackCache-resident track tokens — only uint8 frame
    images go up and logits come down (ImageReidentifier workload,
    tracking_point_reid.py:125-203 / pc_utils.py:239-303). Returns
    (median e2e ms, device/host/tunnel breakdown)."""
    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.inference import PairScorer
    from point_cloud_reid_tpu.models import build_model
    from point_cloud_reid_tpu.tracking import TrackingManager

    cfg = get_experiment("rgb_deit-tiny_point-cat_r_nus_det_4x60_200e")
    model = build_model(cfg["model"], dtype=jnp.bfloat16)
    batch = dict(sparse_1=jnp.zeros((2, 3, 224, 224)),
                 sparse_2=jnp.zeros((2, 3, 224, 224)),
                 id_1=jnp.zeros((2,), jnp.int32),
                 id_2=jnp.zeros((2,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)
    scorer = PairScorer(model, variables, image_mode=True)
    mgr = TrackingManager(scorer)          # no crop_fn -> fused image path
    _bench_image_tracker_e2e.last_mgr = mgr
    captured = {}
    _install_frame_capture(mgr, captured)

    l2cs, Ks = camera_ring()

    rs = np.random.RandomState(0)
    images = rs.randint(0, 256, (6, 3, 900, 1600), dtype=np.uint8)
    ang = rs.rand(n_obj) * 2 * np.pi
    rad = 8.0 + rs.rand(n_obj) * 20.0
    centers = np.stack([rad * np.cos(ang), rad * np.sin(ang),
                        np.zeros(n_obj)], axis=1).astype(np.float32)
    times = []
    for _ in range(10):
        centers[:, :2] += rs.randn(n_obj, 2).astype(np.float32) * 0.2
        boxes = np.concatenate(
            [centers, np.full((n_obj, 3), 2.0, np.float32),
             np.zeros((n_obj, 1), np.float32)], axis=1)
        t0 = time.perf_counter()
        mgr.step((images, l2cs, Ks), boxes, np.ones(n_obj, np.float32),
                 np.zeros(n_obj, np.int64))
        times.append(time.perf_counter() - t0)
    e2e_ms = float(np.median(times[3:]) * 1e3)
    breakdown = None
    if captured:
        dev_ms = _time_captured_device(captured, variables)
        host_ms = _host_pieces_ms(len(mgr.store.active()), n_obj, boxes)
        breakdown = dict(device_ms=round(dev_ms, 1),
                         host_ms=round(host_ms, 1),
                         tunnel_ms=round(e2e_ms - dev_ms - host_ms, 1),
                         device_bound_hz=round(1e3 / (dev_ms + host_ms), 1))
    return e2e_ms, breakdown


def _bench_image_train_step():
    """Image-branch train step at the reference's training scale (4 GPUs x
    60/GPU, DeiT-tiny — configs_reid/reid_nuscenes_image/training_base.py:6):
    B=60/chip, full image loss set (match+cls+fp+vis+triplet, margin 10).
    Driver-visible so the image train path can't regress silently
    (VERDICT r3 item 6). Random-init weights — identical FLOPs/throughput
    to converted pretrained weights."""
    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.models import build_model
    from point_cloud_reid_tpu.train import (TrainState, build_optimizer,
                                            make_train_step)
    from point_cloud_reid_tpu.train.schedules import ScheduleConfig

    cfg = get_experiment("rgb_deit-tiny_point-cat_r_nus_det_4x60_200e")
    model = build_model(cfg["model"], dtype=jnp.bfloat16)
    B = 60
    batch = dict(
        sparse_1=jax.random.normal(jax.random.PRNGKey(0), (B, 3, 224, 224)),
        sparse_2=jax.random.normal(jax.random.PRNGKey(1), (B, 3, 224, 224)),
        label_1=jnp.zeros((B,), jnp.int32),
        label_2=(jnp.arange(B, dtype=jnp.int32) % 2),
        id_1=jnp.arange(B, dtype=jnp.int32),
        id_2=jnp.arange(B, dtype=jnp.int32) % 7,
        vis_1=(jnp.arange(B, dtype=jnp.int32) % 4),
        vis_2=(jnp.arange(B, dtype=jnp.int32) % 4),
    )
    tx = build_optimizer(ScheduleConfig(max_epochs=1, lr=1e-5),
                         steps_per_epoch=100)
    state = TrainState.create(model, tx, batch, rng=jax.random.PRNGKey(2))
    step = make_train_step(
        model, tx, losses_to_use=cfg.get("losses_to_use", dict(match=True)),
        alpha=cfg.get("alpha", {}),
        triplet_margin=cfg.get("triplet_margin", 0.2), donate=False)
    step_x, _ = _compile(step, state, batch, jax.random.PRNGKey(3))
    state, log = step_x(state, batch, jax.random.PRNGKey(3))   # warm
    _sync(log["reid_loss"])
    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, log = step_x(state, batch, jax.random.PRNGKey(4))
    _sync(log["reid_loss"])
    dt = (time.perf_counter() - t0) / n_iters
    return dt * 1e3, B / dt


def _bench_input_pipeline():
    """BatchLoader over a materialized on-disk store — the vectorized pair
    planner + strided native C++ batched reads that feed real training.
    Measured at the MESH-GLOBAL batch (8 chips x 256/chip = 2048): one host
    process must feed the whole v5e-8 data-parallel mesh (the reference's
    per-GPU worker subprocesses, apis/train.py:34-45). Several epochs over a
    ~2.7k-pair store so the number reflects steady-state multi-batch
    throughput rather than one cold batch."""
    from point_cloud_reid_tpu.data import (BatchLoader, CropStore,
                                           PairDataset, SyntheticStore)

    root = "/tmp/pcr_bench_store_v2"
    if not os.path.exists(os.path.join(root, "objects.pkl")):
        SyntheticStore(num_objects=3600, frames_per_obj=6,
                       seed=11).save(root)
    store = CropStore(root, min_points=5)
    classes = [f"class_{i}" for i in range(10)]
    ds = PairDataset(store=store, classes=classes,
                     cls_to_idx={c: i for i, c in enumerate(classes)},
                     tracking_classes={c: c for c in classes},
                     subsample_sparse=128, seed=0)
    assert ds.supports_batch_load
    loader = BatchLoader(ds, batch_size=2048, shuffle=True, seed=0,
                         num_threads=2, drop_last=True)
    list(loader)                           # warm page cache + thread pool
    n_samples = 0
    t0 = time.perf_counter()
    for epoch in range(1, 7):
        loader.set_epoch(epoch)
        for batch in loader:
            n_samples += batch["sparse_1"].shape[0]
    dt = time.perf_counter() - t0
    return n_samples / dt


def main():
    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.models import build_model

    cfg = get_experiment("pts_point-transformer_point-cat_nus_det_4x256_500e")
    model = build_model(cfg["model"], dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    batch = dict(
        sparse_1=jax.random.normal(rng, (2, 128, 3)),
        sparse_2=jax.random.normal(rng, (2, 128, 3)),
        id_1=jnp.zeros((2,), jnp.int32), id_2=jnp.zeros((2,), jnp.int32),
    )
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)

    pairs_per_sec, frame_ms, frame_sync_ms, frame_mfu, big_ms = _bench_tracker(
        model, variables)
    n_chips = max(jax.device_count(), 1)
    value = pairs_per_sec / n_chips

    secondary = dict(tracker_frame_ms=round(frame_ms, 3),
                     tracker_frame_ms_sync=round(frame_sync_ms, 3),
                     tracker_mfu=round(frame_mfu, 4) if frame_mfu else None,
                     tracker_frame_256x256_ms=round(big_ms, 2) if big_ms else None,
                     device_kind=jax.devices()[0].device_kind)
    try:
        step_ms, sps, mfu = _bench_train_step(model)
        secondary.update(train_step_ms=round(step_ms, 3),
                         train_samples_per_sec=round(sps, 1),
                         train_mfu=round(mfu, 4) if mfu else None)
    except Exception as e:     # never kill the headline
        secondary.update(train_step_ms=None, train_error=str(e)[:120])
    # retry each e2e once so a transient tunnel/compile-helper flake can't
    # null a driver-visible field. (The one repeated failure here turned out
    # to be deterministic, not flaky: a 512-track frame overflowed scoped
    # VMEM — fixed by _track_chunks in ops/pallas/match_grid.py.)
    for attempt in range(2):
        try:
            e2e_ms, brk = _bench_tracker_e2e(model, variables)
            secondary["tracker_e2e_ms"] = round(e2e_ms, 1)
            if brk:
                secondary.update(
                    tracker_e2e_device_ms=brk["device_ms"],
                    tracker_e2e_host_ms=brk["host_ms"],
                    tracker_e2e_tunnel_ms=brk["tunnel_ms"],
                    tracker_e2e_device_hz=brk["device_bound_hz"])
            secondary.pop("e2e_error", None)
            break
        except Exception as e:
            secondary.update(tracker_e2e_ms=None, e2e_error=str(e)[:120])
    for attempt in range(2):
        try:
            # Waymo-dense e2e: 256 objects, 153.6k-pt sweeps, 131k gated
            # pairs/frame — 'auto' sparse scoring kicks in at this density
            # (gated pair-list kernel; tracking/manager.py _sparse_on)
            e2e_256, brk = _bench_tracker_e2e(model, variables, n_obj=256)
            secondary["tracker_e2e_256_ms"] = round(e2e_256, 1)
            secondary["tracker_e2e_256_sparse"] = bool(
                _bench_tracker_e2e.last_mgr._cached_pair_frame_fns)
            if brk:
                secondary.update(
                    tracker_e2e_256_device_ms=brk["device_ms"],
                    tracker_e2e_256_host_ms=brk["host_ms"],
                    tracker_e2e_256_tunnel_ms=brk["tunnel_ms"],
                    tracker_e2e_256_device_hz=brk["device_bound_hz"])
            secondary.pop("e2e_256_error", None)
            break
        except Exception as e:
            secondary.update(tracker_e2e_256_ms=None,
                             e2e_256_error=str(e)[:120])
    for attempt in range(2):
        try:
            # image-branch deployment e2e: fused DeviceTrackCache frame at
            # 64 objects x 6 cameras (VERDICT r4 item 1)
            img_e2e, brk = _bench_image_tracker_e2e()
            secondary["image_tracker_e2e_ms"] = round(img_e2e, 1)
            if brk:
                secondary.update(
                    image_tracker_e2e_device_ms=brk["device_ms"],
                    image_tracker_e2e_host_ms=brk["host_ms"],
                    image_tracker_e2e_tunnel_ms=brk["tunnel_ms"],
                    image_tracker_e2e_device_hz=brk["device_bound_hz"])
            secondary.pop("image_e2e_error", None)
            break
        except Exception as e:
            secondary.update(image_tracker_e2e_ms=None,
                             image_e2e_error=str(e)[:120])
    try:
        img_ms, img_pps, img_backend, img_err = _bench_image_frame()
        secondary.update(image_frame_ms=round(img_ms, 2),
                         image_pairs_per_sec_per_chip=round(img_pps, 1),
                         image_frame_backend=img_backend)
        if img_err:
            secondary["image_kernel_error"] = img_err
    except Exception as e:
        secondary.update(image_frame_ms=None, image_error=str(e)[:120])
    try:
        img_step_ms, img_sps = _bench_image_train_step()
        secondary.update(image_train_step_ms=round(img_step_ms, 2),
                         image_train_samples_per_sec=round(img_sps, 1))
    except Exception as e:
        secondary.update(image_train_step_ms=None,
                         image_train_error=str(e)[:120])
    try:
        input_sps = _bench_input_pipeline()
        secondary["input_pipeline_samples_per_sec"] = round(input_sps, 1)
        if secondary.get("train_samples_per_sec"):
            secondary["input_vs_train_step"] = round(
                input_sps / secondary["train_samples_per_sec"], 3)
            # can ONE host feed a full v5e-8 DP mesh? (>1 = yes)
            secondary["input_vs_mesh_demand"] = round(
                input_sps / (secondary["train_samples_per_sec"] * 8), 3)
    except Exception as e:
        secondary.update(input_pipeline_samples_per_sec=None,
                         input_error=str(e)[:120])

    print(json.dumps(dict(
        metric="pairwise_comparisons_per_sec_per_chip",
        value=round(value, 1),
        unit="pairs/s/chip",
        vs_baseline=round(value / TARGET_PER_CHIP, 3),
        secondary=secondary,
    )))


if __name__ == "__main__":
    main()
