"""Point-cloud op library: pure-JAX reference implementations + Pallas TPU kernels.

Capability map to the reference's 12 native extensions (SURVEY.md §2.7):
  furthest_point_sample -> geometry.farthest_point_sample(_with_dist) [+ pallas.fps]
  knn                   -> geometry.knn_indices / knn_feature_space   [+ pallas.knn]
  ball_query            -> geometry.query_ball_point
  group_points          -> geometry.group_points / index_points
  gather_points         -> geometry.index_points
  interpolate           -> geometry.three_nn / three_interpolate / interpolate_idw
  voxel                 -> voxel.voxelize_hard / dynamic_scatter_mean
  bev_pool              -> voxel.bev_pool
  iou3d                 -> boxes.boxes_iou_bev / boxes_iou_3d / nms_bev
  roiaware_pool3d       -> boxes.points_in_rboxes
  norm (SyncBN)         -> models.layers.BatchNorm runs global batch stats under SPMD jit
  paconv                -> sparse.assign_score_withk
  spconv                -> sparse.{build_indice_pairs, submanifold_conv3d,
                           sparse_conv3d, sparse_inverse_conv3d,
                           sparse_maxpool3d, to_dense}
                           (fixed-capacity hash rulebook + gather-matmul-scatter)
  box structures (§2.8) -> boxes3d.Boxes3D (lidar/depth origins, corners,
                           points-in-box, rotate, IoU, NMS)
  BEV feature sampling  -> bev_feat.interpolate_bev(_grid) / get_pixel_feat /
                           get_roi_feat (tracking_helpers.py + lanegcn_nets.py)
"""
from .attention import elu_feature_map, full_attention, linear_attention
from .bev_feat import (
    centered_grid,
    get_pixel_feat,
    get_roi_feat,
    grid_sample_bilinear,
    interpolate_bev,
    interpolate_bev_grid,
    linear_interp,
)
from .boxes import (
    box_corners_3d,
    box_corners_bev,
    boxes_iou_3d,
    boxes_iou_bev,
    boxes_overlap_bev,
    nms_bev,
    points_in_rboxes,
    points_to_box_frame,
    rotation_2d,
)
from .geometry import (
    chamfer_distance,
    farthest_point_sample,
    farthest_point_sample_with_dist,
    get_graph_feature,
    group_points,
    index_points,
    interpolate_idw,
    knn_feature_space,
    knn_indices,
    query_ball_point,
    random_point_sample,
    sample_and_group_all,
    sample_and_group_edge,
    square_distance,
    subsample_pc,
    three_interpolate,
    three_nn,
)
from .boxes3d import Boxes3D
from .sparse import (assign_score_withk, build_indice_pairs,
                     build_strided_output, sparse_conv3d,
                     sparse_inverse_conv3d, sparse_maxpool3d,
                     submanifold_conv3d, to_dense)
from .voxel import bev_pool, dynamic_scatter_mean, voxelize_hard

__all__ = [
    "elu_feature_map", "full_attention", "linear_attention",
    "centered_grid", "get_pixel_feat", "get_roi_feat", "grid_sample_bilinear",
    "interpolate_bev", "interpolate_bev_grid", "linear_interp",
    "box_corners_3d", "box_corners_bev", "boxes_iou_3d", "boxes_iou_bev",
    "boxes_overlap_bev", "nms_bev", "points_in_rboxes", "points_to_box_frame",
    "rotation_2d",
    "chamfer_distance", "farthest_point_sample", "farthest_point_sample_with_dist",
    "get_graph_feature", "group_points", "index_points", "interpolate_idw",
    "knn_feature_space", "knn_indices", "query_ball_point", "random_point_sample",
    "sample_and_group_all", "sample_and_group_edge", "square_distance",
    "subsample_pc", "three_interpolate", "three_nn",
    "bev_pool", "dynamic_scatter_mean", "voxelize_hard",
    "Boxes3D", "assign_score_withk", "build_indice_pairs",
    "build_strided_output", "sparse_conv3d", "sparse_inverse_conv3d",
    "sparse_maxpool3d", "submanifold_conv3d", "to_dense",
]
