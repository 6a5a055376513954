"""sparse ops (paconv/spconv equivalents) + Boxes3D structure tests."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from point_cloud_reid_tpu.ops.boxes3d import Boxes3D
from point_cloud_reid_tpu.ops.sparse import (assign_score_withk,
                                             build_indice_pairs,
                                             submanifold_conv3d)

pytestmark = pytest.mark.quick


def test_assign_score_withk_matches_loop():
    rng = np.random.RandomState(0)
    B, N, Np, K, M, O = 2, 5, 7, 3, 4, 6
    scores = rng.rand(B, N, K, M).astype(np.float32)
    points = rng.randn(B, Np, M, O).astype(np.float32)
    centers = rng.randn(B, N, M, O).astype(np.float32)
    idx = rng.randint(0, Np, (B, N, K))

    out = np.asarray(assign_score_withk(
        jnp.asarray(scores), jnp.asarray(points), jnp.asarray(centers),
        jnp.asarray(idx)))

    ref = np.zeros((B, N, K, O), np.float32)
    for b in range(B):
        for n in range(N):
            for k in range(K):
                for m in range(M):
                    ref[b, n, k] += scores[b, n, k, m] * (
                        points[b, idx[b, n, k], m] - centers[b, n, m])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_indice_pairs_and_submanifold_conv():
    # 4 active voxels in a line along x; 3^3 kernel
    coords = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [5, 5, 5],
                       [0, 0, 0]], np.int32)            # last row = padding
    valid = np.array([1, 1, 1, 1, 0], bool)
    offs = np.stack(np.meshgrid(*([np.arange(-1, 2)] * 3),
                                indexing="ij"), -1).reshape(-1, 3)
    pairs = np.asarray(build_indice_pairs(jnp.asarray(coords),
                                          jnp.asarray(valid),
                                          jnp.asarray(offs, jnp.int32)))
    center_p = 13                                        # offset (0,0,0)
    assert pairs[0, center_p] == 0 and pairs[1, center_p] == 1
    # voxel 0's +x neighbor is voxel 1
    plus_x = int(np.where((offs == [1, 0, 0]).all(1))[0][0])
    assert pairs[0, plus_x] == 1 and pairs[2, plus_x] == -1
    assert (pairs[4] == -1).all()                        # padding row

    # identity-kernel conv: center weight = I, rest 0 -> output == input
    V, Cin = coords.shape[0], 4
    feats = np.random.RandomState(1).randn(V, Cin).astype(np.float32)
    feats[~valid] = 0
    W = np.zeros((27, Cin, Cin), np.float32)
    W[center_p] = np.eye(Cin)
    out = np.asarray(submanifold_conv3d(jnp.asarray(feats),
                                        jnp.asarray(coords),
                                        jnp.asarray(valid), jnp.asarray(W)))
    np.testing.assert_allclose(out[valid], feats[valid], rtol=1e-5, atol=1e-5)
    assert (out[~valid] == 0).all()

    # +x shift kernel moves features down the line
    W2 = np.zeros((27, Cin, Cin), np.float32)
    W2[plus_x] = np.eye(Cin)
    out2 = np.asarray(submanifold_conv3d(jnp.asarray(feats),
                                         jnp.asarray(coords),
                                         jnp.asarray(valid), jnp.asarray(W2)))
    np.testing.assert_allclose(out2[0], feats[1], rtol=1e-5)
    np.testing.assert_allclose(out2[2], np.zeros(Cin), atol=1e-6)


def test_boxes3d_conversion_and_membership():
    t = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    lidar = Boxes3D.lidar(t)                 # z = bottom at 0 -> center 1
    depth = lidar.gravity()
    np.testing.assert_allclose(np.asarray(depth.tensor[0, 2]), 1.0)
    np.testing.assert_allclose(np.asarray(depth.center),
                               np.asarray(lidar.center))

    pts = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 3.0]])
    for b in (lidar, depth):
        mask = np.asarray(b.points_in_boxes(pts))
        assert mask[0, 0] and not mask[1, 0]

    c = np.asarray(lidar.corners())
    assert c.shape == (1, 8, 3)
    assert c[..., 2].min() == 0.0 and c[..., 2].max() == 2.0


def test_boxes3d_rotate_iou():
    a = Boxes3D.lidar(jnp.asarray([[0, 0, 0, 4, 2, 2, 0.0]]))
    b = a.rotate(jnp.pi / 2)
    np.testing.assert_allclose(float(b.yaw[0]), np.pi / 2)
    iou = float(a.iou_bev(b)[0, 0])
    # 4x2 rect vs itself rotated 90deg: overlap 2x2 + corners -> IoU 4/12
    assert 0.25 < iou < 0.45
    assert float(a.iou_3d(a)[0, 0]) > 0.99


def test_boxes3d_pytree():
    b = Boxes3D.lidar(jnp.zeros((3, 7)))
    b2 = jax.tree_util.tree_map(lambda x: x + 1, b)
    assert isinstance(b2, Boxes3D) and float(b2.tensor[0, 0]) == 1.0
