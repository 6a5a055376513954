#!/usr/bin/env python
"""Tracking CLI: run the ReID tracker over scenes, write MOT-style outputs
and the tracking-eval summary.

The user-facing surface for the `tracking/` layer — the TPU-native
equivalent of driving the reference's tracker + tracking-eval hooks
(mmdet3d/models/trackers/deprecated/tracking_manager.py:1-200,
virtual_tracker.py:133-296, core/hooks/utils.py:26-242) through its test
pipeline. One TrackingManager.step per frame runs crops + embed + scoring
as one fused device program (gated sparse pair-list scoring under 'auto');
association decisions stream into TrackingEvalAccumulator whenever gt ids
are available.

Scenes come from `--scene-dir` (one .npz per scene, see below) or from a
built-in synthetic generator (pipeline validation / demo: constant-velocity
objects with birth/death, detector dropout and false positives).

Outputs in --work-dir:
  tracks.jsonl            one line per frame:
                          {"scene", "frame", "tracks": [{"id", "cls",
                           "box" (7), "score"}]}
  tracking_summary.json   TrackingEvalAccumulator.summary() — the input
                          format of tools/tracking_plots.py
plus ONE headline JSON line on stdout (frames, wall-clock Hz, association
precision/recall/id-switches).

Scene .npz format (per frame index i, point mode):
  boxes_{i} (D,7) [cx cy cz dx dy dz yaw], scores_{i} (D,), labels_{i} (D,)
  points_{i} (N,3+) lidar sweep; gt_ids_{i} (D,) optional (-1 = detector FP)
Image mode replaces points_{i} with images_{i} (ncam,3,H,W) uint8,
lidar2cams_{i} (ncam,4,4), intrinsics_{i} (ncam,3,3).

Usage:
    python tools/track.py <experiment> [--checkpoint <orbax-dir>]
        [--scene-dir scenes/] [--scenes 2 --frames 40 --objects 16]
        [--sparse auto|always|never] [--work-dir out/]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("experiment")
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir (ckpt_last / ckpt_best / "
                        "tools/convert_checkpoint.py output); fresh-init "
                        "weights when omitted (pipeline smoke only)")
    p.add_argument("--scene-dir", default=None,
                   help="directory of per-scene .npz files (see module "
                        "docstring); default: synthetic scenes")
    p.add_argument("--scenes", type=int, default=2)
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--objects", type=int, default=16)
    p.add_argument("--pts-per-obj", type=int, default=400)
    p.add_argument("--fp-rate", type=float, default=0.1,
                   help="expected detector false positives per frame, as a "
                        "fraction of --objects")
    p.add_argument("--dropout", type=float, default=0.05,
                   help="per-object detection dropout probability")
    p.add_argument("--num-classes", type=int, default=3)
    p.add_argument("--image-hw", type=int, nargs=2, default=(900, 1600),
                   metavar=("H", "W"), help="synthetic camera resolution "
                   "(image experiments)")
    p.add_argument("--subsample", type=int, default=128,
                   help="points per crop (subsample_number)")
    p.add_argument("--sparse", default="auto",
                   choices=("auto", "always", "never"))
    p.add_argument("--method", default="greedy",
                   choices=("greedy", "hungarian"))
    p.add_argument("--match-threshold", type=float, default=0.7)
    p.add_argument("--max-distance", type=float, default=2.0)
    p.add_argument("--nms-threshold", type=float, default=None)
    p.add_argument("--max-age", type=int, default=3)
    p.add_argument("--min-hits", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--work-dir", default=".")
    p.add_argument("--set", dest="set_options", action="append", default=[],
                   metavar="KEY=VAL", help="config override (dotted path)")
    return p.parse_args(argv)


def _load_variables(model, init_batch, checkpoint):
    variables = model.init(jax.random.PRNGKey(0), init_batch, train=False)
    if checkpoint is None:
        print("WARNING: no --checkpoint; fresh-init weights score noise "
              "(pipeline smoke only)", file=sys.stderr)
        return variables
    import orbax.checkpoint as ocp
    restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(checkpoint))
    # accept a full TrainState save (Trainer.save_checkpoint), a converted
    # checkpoint (tools/convert_checkpoint.py), or bare variables
    params = restored.get("params", restored)
    if isinstance(params, dict) and "params" in params:   # variables nest
        params = params["params"]
    out = {"params": params}
    bs = restored.get("batch_stats")
    if bs:
        out["batch_stats"] = bs
    return out


def _camera_ring(H: int, W: int):
    """bench.camera_ring (the 6-camera nuScenes-geometry ring), intrinsics
    rescaled from its native 1600x900 to (W, H)."""
    from bench import camera_ring
    l2cs, Ks = camera_ring()
    Ks = Ks.copy()
    Ks[:, 0, :] *= W / 1600.0
    Ks[:, 1, :] *= H / 900.0
    return l2cs, Ks


def synth_scene(rs: np.random.RandomState, args, image_mode: bool):
    """Constant-velocity objects with birth/death windows + a detector model
    (position noise, dropout, false positives). Yields per-frame
    (frame_data, boxes, scores, labels, gt_ids)."""
    n = args.objects
    cls = rs.randint(0, args.num_classes, n)
    sizes = (rs.rand(n, 3) * 2 + 1.5).astype(np.float32)
    pos = (rs.rand(n, 3) * 50 - 25).astype(np.float32)
    pos[:, 2] = 0.0
    vel = (rs.randn(n, 2) * 0.15).astype(np.float32)
    birth = rs.randint(0, max(args.frames // 3, 1), n)
    death = rs.randint(2 * args.frames // 3, args.frames + 1, n)
    if image_mode:
        H, W = args.image_hw
        images = rs.randint(0, 256, (6, 3, H, W), dtype=np.uint8)
        l2cs, Ks = _camera_ring(H, W)
    for t in range(args.frames):
        pos[:, :2] += vel
        live = (birth <= t) & (t < death)
        det = live & (rs.rand(n) >= args.dropout)
        boxes = np.concatenate(
            [pos[det] + rs.randn(det.sum(), 3).astype(np.float32) * 0.1,
             sizes[det],
             np.zeros((det.sum(), 1), np.float32)], axis=1)
        gt = np.flatnonzero(det).astype(np.int64)
        n_fp = rs.poisson(args.fp_rate * n)
        if n_fp:
            fp_pos = (rs.rand(n_fp, 3) * 50 - 25).astype(np.float32)
            fp_pos[:, 2] = 0.0
            boxes = np.concatenate([boxes, np.concatenate(
                [fp_pos, np.full((n_fp, 3), 2.0, np.float32),
                 np.zeros((n_fp, 1), np.float32)], axis=1)], axis=0)
            gt = np.concatenate([gt, np.full(n_fp, -1, np.int64)])
        scores = np.ones(len(boxes), np.float32)
        labels = np.concatenate([cls[det],
                                 rs.randint(0, args.num_classes, n_fp)])
        if image_mode:
            frame = (images, l2cs, Ks)
        else:
            centers = pos[live]
            pts = (np.repeat(centers, args.pts_per_obj, axis=0)
                   + rs.randn(live.sum() * args.pts_per_obj, 3)
                   .astype(np.float32) * 0.3)
            frame = pts
        yield frame, boxes.astype(np.float32), scores, labels, gt


def load_scene(path: str, image_mode: bool):
    """Frames from one scene .npz (format in the module docstring)."""
    z = np.load(path)
    n_frames = sum(1 for k in z.files if k.startswith("boxes_"))
    for t in range(n_frames):
        boxes = z[f"boxes_{t}"].astype(np.float32)
        scores = z[f"scores_{t}"].astype(np.float32)
        labels = z[f"labels_{t}"].astype(np.int64)
        gt = z[f"gt_ids_{t}"] if f"gt_ids_{t}" in z.files else None
        if image_mode:
            frame = (z[f"images_{t}"], z[f"lidar2cams_{t}"],
                     z[f"intrinsics_{t}"])
        else:
            frame = z[f"points_{t}"]
        yield frame, boxes, scores, labels, gt


def main(argv=None):
    args = parse_args(argv)
    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.evaluation import TrackingEvalAccumulator
    from point_cloud_reid_tpu.inference import PairScorer
    from point_cloud_reid_tpu.models import build_model
    from point_cloud_reid_tpu.tracking import TrackingManager

    cfg = get_experiment(args.experiment, set_options=args.set_options)
    image_mode = cfg["model"].get("type") == "ImageReIDNet"
    model = build_model(cfg["model"],
                        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    if image_mode:
        S = int(cfg["model"].get("image_size", 224))
        init_batch = dict(sparse_1=jnp.zeros((2, 3, S, S)),
                          sparse_2=jnp.zeros((2, 3, S, S)),
                          id_1=jnp.zeros((2,), jnp.int32),
                          id_2=jnp.zeros((2,), jnp.int32))
    else:
        init_batch = dict(sparse_1=jnp.zeros((2, args.subsample, 3)),
                          sparse_2=jnp.zeros((2, args.subsample, 3)),
                          id_1=jnp.zeros((2,), jnp.int32),
                          id_2=jnp.zeros((2,), jnp.int32))
    variables = _load_variables(model, init_batch, args.checkpoint)

    recorder = TrackingEvalAccumulator()
    mgr = TrackingManager(
        PairScorer(model, variables, image_mode=image_mode),
        subsample_number=args.subsample,
        match_threshold=args.match_threshold,
        max_distance=args.max_distance, method=args.method,
        max_age=args.max_age, min_hits=args.min_hits,
        nms_threshold=args.nms_threshold, seed=args.seed,
        eval_recorder=recorder, sparse_scoring=args.sparse)

    if args.scene_dir:
        scene_files = sorted(glob.glob(os.path.join(args.scene_dir, "*.npz")))
        if not scene_files:
            sys.exit(f"no .npz scenes under {args.scene_dir}")
        scenes = [(os.path.basename(f), load_scene(f, image_mode))
                  for f in scene_files]
    else:
        rs = np.random.RandomState(args.seed)
        scenes = [(f"synthetic_{s}", synth_scene(rs, args, image_mode))
                  for s in range(args.scenes)]

    os.makedirs(args.work_dir, exist_ok=True)
    tracks_path = os.path.join(args.work_dir, "tracks.jsonl")
    step_times, n_frames = [], 0
    with open(tracks_path, "w") as out:
        for scene_name, frames in scenes:
            for t, (frame, boxes, scores, labels, gt) in enumerate(frames):
                t0 = time.perf_counter()
                tracks = mgr.step(frame, boxes, scores, labels,
                                  det_gt_ids=gt)
                step_times.append(time.perf_counter() - t0)
                n_frames += 1
                out.write(json.dumps(dict(
                    scene=scene_name, frame=t,
                    tracks=[dict(id=tr.track_id, cls=tr.cls,
                                 box=[round(float(x), 4) for x in tr.box],
                                 score=round(tr.score, 4))
                            for tr in tracks])) + "\n")
            mgr.end_scene()

    summary = recorder.summary()
    summary_path = os.path.join(args.work_dir, "tracking_summary.json")
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=1)

    warm = step_times[min(3, len(step_times) - 1):]
    print(json.dumps(dict(
        experiment=args.experiment, image_mode=image_mode,
        frames=n_frames, scenes=len(scenes),
        median_step_ms=round(float(np.median(warm)) * 1e3, 2),
        wall_hz=round(1.0 / max(float(np.median(warm)), 1e-9), 2),
        association=summary["association"],
        outputs=dict(tracks=tracks_path, summary=summary_path)), indent=None))


if __name__ == "__main__":
    main()
