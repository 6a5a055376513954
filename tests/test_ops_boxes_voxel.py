"""Tests for box geometry (IoU/NMS/points-in-box) and voxel ops."""
import numpy as np
import jax.numpy as jnp

from point_cloud_reid_tpu import ops
import pytest

pytestmark = pytest.mark.quick


def test_points_in_rboxes_axis_aligned():
    boxes = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.0]], dtype=jnp.float32)
    pts = jnp.asarray([[0, 0, 1], [0.9, 0.9, 0.5], [1.5, 0, 1], [0, 0, -0.1],
                       [0, 0, 2.1]], dtype=jnp.float32)
    m = np.asarray(ops.points_in_rboxes(pts, boxes))[:, 0]
    np.testing.assert_array_equal(m, [True, True, False, False, False])


def test_points_in_rboxes_rotated():
    # box rotated 45deg: the point (1.2, 0, 1) is inside (diag half-extent sqrt(2))
    boxes = jnp.asarray([[0, 0, 0, 2, 2, 2, np.pi / 4]], dtype=jnp.float32)
    pts = jnp.asarray([[1.2, 0, 1], [1.2, 1.2, 1]], dtype=jnp.float32)
    m = np.asarray(ops.points_in_rboxes(pts, boxes))[:, 0]
    np.testing.assert_array_equal(m, [True, False])


def test_points_to_box_frame_roundtrip():
    box = jnp.asarray([2.0, -1.0, 0.5, 4.0, 2.0, 1.5, np.pi / 3], dtype=jnp.float32)
    corners = ops.box_corners_3d(box[None])[0]       # (8,3)
    local = np.asarray(ops.points_to_box_frame(corners, box))
    # corners in box frame are at +-dx/2, +-dy/2, +-dz/2
    np.testing.assert_allclose(np.sort(np.abs(local[:, 0]))[-1], 2.0, atol=1e-2)
    np.testing.assert_allclose(np.abs(local[:, 2]).max(), 0.75, atol=1e-3)


def test_iou_bev_identical_and_disjoint():
    a = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.3]], dtype=jnp.float32)
    b = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.3], [10, 10, 0, 2, 2, 2, 0.0]],
                    dtype=jnp.float32)
    iou = np.asarray(ops.boxes_iou_bev(a, b))
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-4)
    np.testing.assert_allclose(iou[0, 1], 0.0, atol=1e-6)


def test_iou_bev_axis_aligned_known_value():
    a = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.0]], dtype=jnp.float32)
    b = jnp.asarray([[1, 0, 0, 2, 2, 2, 0.0]], dtype=jnp.float32)
    iou = float(ops.boxes_iou_bev(a, b)[0, 0])
    # overlap 1x2=2, union 4+4-2=6
    np.testing.assert_allclose(iou, 2 / 6, atol=1e-4)


def test_iou3d_z_overlap():
    a = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.0]], dtype=jnp.float32)
    b = jnp.asarray([[0, 0, 1, 2, 2, 2, 0.0]], dtype=jnp.float32)
    iou = float(ops.boxes_iou_3d(a, b)[0, 0])
    # inter 4*1=4, union 8+8-4=12
    np.testing.assert_allclose(iou, 4 / 12, atol=1e-4)


def test_nms_bev_suppression():
    boxes = jnp.asarray([
        [0, 0, 0, 2, 2, 2, 0.0],
        [0.1, 0, 0, 2, 2, 2, 0.0],   # overlaps first heavily
        [10, 10, 0, 2, 2, 2, 0.0],
    ], dtype=jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(ops.nms_bev(boxes, scores, thresh=0.5, max_out=3))
    assert keep[0] == 0 and keep[1] == 2 and keep[2] == -1


def test_voxelize_hard_basic():
    pts = jnp.asarray([
        [0.1, 0.1, 0.1], [0.2, 0.2, 0.2],    # same voxel
        [1.5, 0.1, 0.1],                      # second voxel
        [9.0, 9.0, 9.0],                      # out of range
    ], dtype=jnp.float32)
    voxels, coords, num_points, num_voxels = ops.voxelize_hard(
        pts, voxel_size=(1, 1, 1), pc_range=(0, 0, 0, 4, 4, 4),
        max_points_per_voxel=4, max_voxels=8)
    assert int(num_voxels) == 2
    counts = np.asarray(num_points)
    assert sorted(counts[counts > 0].tolist()) == [1, 2]
    # coords are (z,y,x)
    cset = {tuple(c) for c in np.asarray(coords) if c[0] >= 0}
    assert (0, 0, 0) in cset and (0, 0, 1) in cset


def test_dynamic_scatter_mean():
    feats = jnp.asarray([[1.0], [3.0], [10.0], [5.0]])
    ids = jnp.asarray([0, 0, 1, -1])
    means, counts = ops.dynamic_scatter_mean(feats, ids, num_voxels=3)
    np.testing.assert_allclose(np.asarray(means)[:2, 0], [2.0, 10.0])
    np.testing.assert_allclose(np.asarray(counts)[:2], [2.0, 1.0])


def test_bev_pool():
    feats = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    ranks = jnp.asarray([1, 1, -1])
    out = np.asarray(ops.bev_pool(feats, ranks, num_bins=3))
    np.testing.assert_allclose(out[1], [4.0, 6.0])
    np.testing.assert_allclose(out[0], [0.0, 0.0])
