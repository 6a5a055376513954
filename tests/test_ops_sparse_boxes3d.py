"""sparse ops (paconv/spconv equivalents) + Boxes3D structure tests."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from point_cloud_reid_tpu.ops.boxes3d import Boxes3D
from point_cloud_reid_tpu.ops.sparse import (assign_score_withk,
                                             build_indice_pairs,
                                             sparse_conv3d,
                                             sparse_inverse_conv3d,
                                             sparse_maxpool3d,
                                             submanifold_conv3d, to_dense)

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


def _random_voxels(rng, n_active, n_pad, grid, cin):
    """Distinct active coords + arbitrary padded rows, features zeroed on
    the pads (the fixed-capacity contract)."""
    all_coords = np.stack(np.meshgrid(*[np.arange(g) for g in grid],
                                      indexing="ij"), -1).reshape(-1, 3)
    pick = rng.choice(len(all_coords), n_active, replace=False)
    coords = np.concatenate([all_coords[pick],
                             np.zeros((n_pad, 3), np.int64)]).astype(np.int32)
    valid = np.concatenate([np.ones(n_active, bool), np.zeros(n_pad, bool)])
    feats = rng.randn(n_active + n_pad, cin).astype(np.float32)
    feats[~valid] = 0.0
    return coords, valid, feats


def test_sparse_conv3d_matches_dense():
    """Strided sparse conv == XLA dense conv at the active output sites, and
    the output site set is exactly the kernel-footprint cover (spconv
    SparseConv3d semantics, conv.py:49-455)."""
    rng = np.random.RandomState(0)
    grid, cin, cout, k, s, p = (6, 6, 6), 3, 5, 3, 2, 1
    coords, valid, feats = _random_voxels(rng, 30, 4, grid, cin)
    weights = rng.randn(k ** 3, cin, cout).astype(np.float32) * 0.3
    bias = rng.randn(cout).astype(np.float32)

    out, oc, ov, pairs = jax.jit(
        lambda f, c, v: sparse_conv3d(
            f, c, v, jnp.asarray(weights), stride=s, padding=p,
            bias=jnp.asarray(bias), capacity=30 * k ** 3,
            spatial_shape=grid))(jnp.asarray(feats), jnp.asarray(coords),
                                 jnp.asarray(valid))
    out, oc, ov = np.asarray(out), np.asarray(oc), np.asarray(ov)

    # dense reference
    dense = np.zeros((1,) + grid + (cin,), np.float32)
    dense[0, coords[valid][:, 0], coords[valid][:, 1],
          coords[valid][:, 2]] = feats[valid]
    kern = weights.reshape(k, k, k, cin, cout)
    ref = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(dense), jnp.asarray(kern), (s, s, s),
        [(p, p)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))[0]

    # expected site set: any active input inside the receptive field
    out_shape = tuple((g + 2 * p - k) // s + 1 for g in grid)
    expected = set()
    for x in coords[valid]:
        for off in np.ndindex(k, k, k):
            o = x + p - np.asarray(off)
            if np.all(o % s == 0):
                o = o // s
                if np.all(o >= 0) and np.all(o < out_shape):
                    expected.add(tuple(o))
    got = {tuple(c) for c in oc[ov]}
    assert got == expected
    for i in np.where(ov)[0]:
        np.testing.assert_allclose(out[i], ref[tuple(oc[i])] + bias,
                                   rtol=1e-4, atol=1e-4)
    assert np.all(out[~ov] == 0)
    # pairs point at the right inputs (feed the inverse couple)
    assert pairs.shape == (30 * k ** 3, k ** 3)


def test_sparse_inverse_conv3d_matches_loop():
    """Inverse conv scatters back onto the couple's pre-strided sites
    (SparseInverseConv3d, conv.py:153-208)."""
    rng = np.random.RandomState(1)
    grid, cin, cmid, cout, k, s, p = (6, 6, 6), 2, 4, 3, 3, 2, 1
    coords, valid, feats = _random_voxels(rng, 20, 3, grid, cin)
    w_down = rng.randn(k ** 3, cin, cmid).astype(np.float32) * 0.3
    w_up = rng.randn(k ** 3, cmid, cout).astype(np.float32) * 0.3

    mid, oc, ov, pairs = sparse_conv3d(
        jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid),
        jnp.asarray(w_down), stride=s, padding=p, capacity=len(coords) * 4,
        spatial_shape=grid)
    up = np.asarray(jax.jit(
        lambda f, pr: sparse_inverse_conv3d(f, pr, jnp.asarray(w_up),
                                            n_out=len(coords)))(mid, pairs))

    mid_np, pairs_np = np.asarray(mid), np.asarray(pairs)
    ref = np.zeros((len(coords), cout), np.float32)
    for o in range(pairs_np.shape[0]):
        for pk in range(k ** 3):
            i = pairs_np[o, pk]
            if i >= 0:
                ref[i] += mid_np[o] @ w_up[pk]
    np.testing.assert_allclose(up, ref, rtol=1e-4, atol=1e-4)
    # inverse lands only on original active sites
    assert np.all(up[~valid] == 0)


def test_sparse_maxpool3d_matches_loop():
    """Max over PRESENT neighbors only (SparseMaxPool3d, pool.py:21-81)."""
    rng = np.random.RandomState(2)
    grid, c, k = (6, 6, 6), 4, 2
    coords, valid, feats = _random_voxels(rng, 25, 3, grid, c)
    out, oc, ov = jax.jit(
        lambda f, cd, v: sparse_maxpool3d(f, cd, v, kernel_size=k,
                                          capacity=100,
                                          spatial_shape=grid))(
        jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid))
    out, oc, ov = np.asarray(out), np.asarray(oc), np.asarray(ov)

    lut = {tuple(cd): f for cd, f in zip(coords[valid], feats[valid])}
    expected = {}
    for x in lut:
        o = tuple(np.asarray(x) // k)
        cur = expected.get(o)
        expected[o] = lut[x] if cur is None else np.maximum(cur, lut[x])
    got = {tuple(c_): out[i] for i, c_ in enumerate(oc) if ov[i]}
    assert set(got) == set(expected)
    for site in expected:
        np.testing.assert_allclose(got[site], expected[site], rtol=1e-6)


def test_to_dense_roundtrip():
    rng = np.random.RandomState(3)
    coords, valid, feats = _random_voxels(rng, 15, 2, (4, 5, 6), 3)
    dense = np.asarray(to_dense(jnp.asarray(feats), jnp.asarray(coords),
                                jnp.asarray(valid), (4, 5, 6)))
    assert dense.shape == (4, 5, 6, 3)
    for cd, f, v in zip(coords, feats, valid):
        if v:
            np.testing.assert_allclose(dense[tuple(cd)], f)
    assert np.count_nonzero(dense.reshape(-1, 3).any(-1)) == 15


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
