"""Experiment leaves: 4-axis composition + named experiment registry.

compose(dataset, model, schedule, runtime) mirrors the reference leaf pattern
(_base_ = [dataset, reidentifier, schedule, runtime],
configs_reid/reid_nuscenes_pts/pts_point-transformer_point-cat_nus_det_4x256_500e.py:1-27).

schedule('cyclic_500e_lr3e-4_norm1_accum2') parses the reference's schedule-file
naming grid directly (configs_reid/_base_/schedules/*) so every released
schedule is addressable by its original name.
"""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional

from ..train.schedules import ScheduleConfig
from . import datasets as D
from . import models as M


def schedule(name: str) -> ScheduleConfig:
    """Parse 'cyclic_{E}e_lr{LR}[_norm1][_accumN]' / 'cosine' names."""
    if name.startswith("cosine"):
        return ScheduleConfig(policy="cosine")
    m = re.match(r"cyclic_(\d+)e_lr([0-9.e-]+?)(_norm1)?(_accum(\d+))?$", name)
    if not m:
        raise ValueError(f"unknown schedule name: {name}")
    return ScheduleConfig(
        policy="cyclic",
        max_epochs=int(m.group(1)),
        lr=float(m.group(2)),
        grad_clip_norm=1.0 if m.group(3) else 35.0,
        cumulative_iters=int(m.group(5)) if m.group(5) else 1,
    )


def runtime(work_dir: Optional[str] = None, seed: int = 66,
            eval_interval: int = 25, checkpoint_interval: int = 5,
            log_interval: int = 50, validate: bool = False,
            deterministic: bool = False) -> Dict[str, Any]:
    """Runtime axis (reidentification_runtime.py: interval=5 ckpt, seed 66;
    *_testing.py flips validate/deterministic)."""
    return dict(work_dir=work_dir, seed=seed, eval_interval=eval_interval,
                checkpoint_interval=checkpoint_interval,
                log_interval=log_interval, validate=validate,
                deterministic=deterministic)


def compose(dataset: Dict[str, Any], model: Dict[str, Any],
            sched: ScheduleConfig, rt: Optional[Dict[str, Any]] = None,
            losses_to_use: Optional[Dict[str, bool]] = None,
            alpha: Optional[Dict[str, float]] = None) -> Dict[str, Any]:
    """One experiment dict: the unit train.py consumes."""
    cfg = dict(
        dataset=dataset,
        model=model,
        schedule=sched,
        runtime=rt or runtime(),
        # released configs train with the match loss only
        # (pts_point-transformer_point-cat_nus_det_4x256_500e.py:8-15)
        losses_to_use=losses_to_use or dict(match=True),
        alpha=alpha or {},
    )
    return cfg


# ---- named experiment registry (the reference's config leaves) --------------

def _nus_pts_flagship(**kw):
    return compose(D.nuscenes_pts(**kw), M.point_transformer_point_cat(),
                   schedule("cyclic_500e_lr3e-4"))


def _nus_pts_pointnet(**kw):
    return compose(D.nuscenes_pts(**kw), M.pointnet_point_cat(),
                   schedule("cyclic_500e_lr3e-4"))


def _nus_pts_dgcnn(**kw):
    return compose(D.nuscenes_pts(**kw), M.dgcnn_point_cat(),
                   schedule("cyclic_500e_lr3e-4"))


def _nus_pts_baseline(**kw):
    return compose(D.nuscenes_pts(**kw), M.point_transformer_baseline(),
                   schedule("cyclic_500e_lr3e-4"))


def _nus_pts_baseline_stnet(**kw):
    return compose(D.nuscenes_pts(**kw),
                   M.point_transformer_baseline(stnet=True),
                   schedule("cyclic_500e_lr3e-4"))


def _waymo_pts_flagship(**kw):
    return compose(D.waymo_pts(**kw),
                   M.point_transformer_point_cat(num_classes=6),
                   schedule("cyclic_400e_lr3e-4"))


def _num_point_ablation(n: int, **kw):
    # reid_waymo_pts/num_point_ablation/* trains at 160..2048 points
    return compose(D.waymo_pts(subsample_sparse=n, **kw),
                   M.point_transformer_point_cat(num_classes=6),
                   schedule("cyclic_400e_lr3e-4"))


def _nus_image_deit(variant: str, **kw):
    return compose(D.nuscenes_image(**kw), M.image_deit_point_cat(variant),
                   schedule("cyclic_200e_lr1e-5"),
                   losses_to_use=dict(match=True, cls=True, fp=True, vis=True,
                                      triplet=True))


EXPERIMENTS: Dict[str, Callable[..., Dict[str, Any]]] = {
    # nuScenes points (reid_nuscenes_pts/)
    "pts_point-transformer_point-cat_nus_det_4x256_500e": _nus_pts_flagship,
    "pts_pointnet_point-cat_nus_det_4x256_500e": _nus_pts_pointnet,
    "pts_dgcnn_point-cat_nus_det_4x256_500e": _nus_pts_dgcnn,
    "pts_point-transformer_baseline_nus_det_4x256_500e": _nus_pts_baseline,
    "pts_point-transformer_baseline-stnet_nus_det_4x256_500e":
        _nus_pts_baseline_stnet,
    "pts_point-transformer-1.5M_point-cat_nus_det_4x256_500e":
        lambda **kw: compose(D.nuscenes_pts(**kw),
                             M.point_transformer_scaled("1.5M"),
                             schedule("cyclic_500e_lr3e-4")),
    "pts_point-transformer-7M_point-cat_nus_det_4x256_500e":
        lambda **kw: compose(D.nuscenes_pts(**kw),
                             M.point_transformer_scaled("7M"),
                             schedule("cyclic_500e_lr3e-4")),
    "pts_point-transformer_point-cat_256pts_nus_det_4x256_500e":
        lambda **kw: compose(D.nuscenes_pts(subsample_sparse=256, **kw),
                             M.point_transformer_point_cat(),
                             schedule("cyclic_500e_lr3e-4")),
    "pts_point-transformer_point-cat_512pts_nus_det_4x256_500e":
        lambda **kw: compose(D.nuscenes_pts(subsample_sparse=512, **kw),
                             M.point_transformer_point_cat(),
                             schedule("cyclic_500e_lr3e-4")),
    # Waymo points (reid_waymo_pts/) + ablations
    "pts_point-transformer_point-cat_waymo_det_4x256_400e": _waymo_pts_flagship,
    **{f"pts_point-transformer_point-cat_waymo_{n}pts":
       (lambda n=n, **kw: _num_point_ablation(n, **kw))
       for n in (160, 256, 512, 1024, 2048)},
    # images (reid_nuscenes_image/)
    "image_deit-tiny_point-cat_nus_det_4x60_200e":
        lambda **kw: _nus_image_deit("deit-tiny", **kw),
    "image_deit-base_point-cat_nus_det_4x60_200e":
        lambda **kw: _nus_image_deit("deit-base", **kw),
    "image_beit-base_nus_det_4x60_200e":
        lambda **kw: _nus_image_deit("beit", **kw),
}


def get_experiment(name: str, **overrides) -> Dict[str, Any]:
    if name not in EXPERIMENTS:
        raise KeyError(f"unknown experiment {name}; known: "
                       f"{sorted(EXPERIMENTS)}")
    return EXPERIMENTS[name](**overrides)
