"""Config system: plain-dict factories composed on 4 axes.

Replaces mmcv Config + _base_ inheritance (SURVEY.md §2.2) with Python
functions. An experiment is compose(dataset, model, schedule, runtime) — the
same 4-axis structure the reference's config leaves use
(configs_reid/reid_nuscenes_pts/pts_point-transformer_point-cat_nus_det_4x256_500e.py:1-5),
but every value is a literal dict you can print, diff, and json.dump.
"""
from .datasets import nuscenes_pts, nuscenes_image, waymo_pts, waymo_image
from .models import (
    point_transformer_point_cat,
    pointnet_point_cat,
    dgcnn_point_cat,
    point_transformer_baseline,
    image_deit_point_cat,
)
from .experiments import (EXPERIMENTS, apply_overrides, compose,
                          get_experiment, schedule)

__all__ = [
    "nuscenes_pts", "nuscenes_image", "waymo_pts", "waymo_image",
    "point_transformer_point_cat", "pointnet_point_cat", "dgcnn_point_cat",
    "point_transformer_baseline", "image_deit_point_cat",
    "EXPERIMENTS", "apply_overrides", "compose", "get_experiment", "schedule",
]
