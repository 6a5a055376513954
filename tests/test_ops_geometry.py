"""Unit tests for ops.geometry against independent numpy references.

Numpy oracles are written from the documented semantics (SURVEY.md §2.7 /
pointnet2_utils.py behavior), not ported code.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_cloud_reid_tpu import ops

pytestmark = pytest.mark.quick


def np_square_distance(src, dst):
    return ((src[:, :, None, :] - dst[:, None, :, :]) ** 2).sum(-1)


def test_square_distance(rng):
    src = rng.randn(2, 7, 3).astype(np.float32)
    dst = rng.randn(2, 5, 3).astype(np.float32)
    got = np.asarray(ops.square_distance(jnp.asarray(src), jnp.asarray(dst)))
    want = np_square_distance(src, dst)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_index_points(rng):
    pts = rng.randn(2, 10, 4).astype(np.float32)
    idx = rng.randint(0, 10, size=(2, 6))
    got = np.asarray(ops.index_points(jnp.asarray(pts), jnp.asarray(idx)))
    want = np.stack([pts[b][idx[b]] for b in range(2)])
    np.testing.assert_allclose(got, want)
    # 3D index (grouping)
    idx3 = rng.randint(0, 10, size=(2, 6, 5))
    got3 = np.asarray(ops.index_points(jnp.asarray(pts), jnp.asarray(idx3)))
    want3 = np.stack([pts[b][idx3[b]] for b in range(2)])
    np.testing.assert_allclose(got3, want3)


def test_knn_indices_matches_bruteforce(rng):
    xyz = rng.randn(2, 32, 3).astype(np.float32)
    q = rng.randn(2, 9, 3).astype(np.float32)
    idx = np.asarray(ops.knn_indices(4, jnp.asarray(xyz), jnp.asarray(q)))
    d = np_square_distance(q, xyz)
    want = np.argsort(d, axis=-1, kind="stable")[..., :4]
    np.testing.assert_array_equal(idx, want)


def test_knn_topk_same_set_as_argsort(rng):
    xyz = rng.randn(1, 64, 3).astype(np.float32)
    q = xyz[:, :16]
    a = np.asarray(ops.knn_indices(8, jnp.asarray(xyz), jnp.asarray(q), method="argsort"))
    b = np.asarray(ops.knn_indices(8, jnp.asarray(xyz), jnp.asarray(q), method="topk"))
    # same neighbor sets (ordering may differ on exact ties only)
    for bi in range(1):
        for si in range(16):
            assert set(a[bi, si].tolist()) == set(b[bi, si].tolist())


def test_fps_spreads_points():
    # A line of points: FPS from index 0 must pick the far end second.
    xyz = jnp.asarray(np.linspace(0, 1, 16)[:, None].repeat(3, 1)[None].astype(np.float32))
    idx = np.asarray(ops.farthest_point_sample(xyz, 3))
    assert idx[0, 0] == 0
    assert idx[0, 1] == 15
    assert idx[0, 2] in (7, 8)


def test_fps_with_dist_matches_fps(rng):
    xyz = rng.randn(2, 20, 3).astype(np.float32)
    d = np_square_distance(xyz, xyz)
    a = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 6))
    b = np.asarray(ops.farthest_point_sample_with_dist(jnp.asarray(d), 6))
    np.testing.assert_array_equal(a, b)


def test_query_ball_point_fill_semantics(rng):
    xyz = rng.rand(1, 30, 3).astype(np.float32)
    q = xyz[:, :4]
    idx = np.asarray(ops.query_ball_point(0.2, 8, jnp.asarray(xyz), jnp.asarray(q)))
    d = np_square_distance(q, xyz)[0]
    for s in range(4):
        inside = np.where(d[s] <= 0.2 ** 2 + 1e-9)[0]
        got = idx[0, s]
        # all returned indices must be inside the ball
        assert set(got.tolist()) <= set(inside.tolist())
        # fill slots repeat the first in-radius index
        first = np.sort(inside)[0]
        if len(inside) < 8:
            assert (got == first).sum() >= 8 - len(inside)


def test_random_point_sample_first_n():
    xyz = jnp.zeros((3, 10, 3))
    idx = np.asarray(ops.random_point_sample(xyz, 4))
    np.testing.assert_array_equal(idx, np.tile(np.arange(4), (3, 1)))


def test_three_interpolate_exact_on_known_points(rng):
    known = rng.randn(1, 12, 3).astype(np.float32)
    feats = rng.randn(1, 12, 5).astype(np.float32)
    out = np.asarray(ops.interpolate_idw(jnp.asarray(known), jnp.asarray(known),
                                         jnp.asarray(feats)))
    np.testing.assert_allclose(out, feats, atol=1e-3)


def test_sample_and_group_edge_shapes_and_content(rng):
    xyz = rng.randn(2, 16, 3).astype(np.float32)
    feats = rng.randn(2, 16, 6).astype(np.float32)
    new_xyz, new_points = ops.sample_and_group_edge(
        nsample=4, xyz=jnp.asarray(xyz), points=jnp.asarray(feats), numpoints=8)
    assert new_xyz.shape == (2, 8, 3)
    assert new_points.shape == (2, 8, 4, 3 + 6 + 6)
    # centers are the first 8 points (RANDOM sampling = first-n)
    np.testing.assert_allclose(np.asarray(new_xyz), xyz[:, :8], atol=1e-6)
    # first neighbor of each center is itself -> xyz_norm ~ 0, feat diff ~ 0
    np.testing.assert_allclose(np.asarray(new_points)[:, :, 0, :3], 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_points)[:, :, 0, 9:], 0.0, atol=1e-5)
    # center feature channel equals gathered center feats
    np.testing.assert_allclose(np.asarray(new_points)[:, :, 0, 3:9], feats[:, :8],
                               atol=1e-5)


def test_get_graph_feature_edgeconv(rng):
    x = rng.randn(2, 5, 12).astype(np.float32)  # (B, C, N)
    out = np.asarray(ops.get_graph_feature(jnp.asarray(x), k=4))
    assert out.shape == (2, 10, 12, 4)
    # nearest neighbor of each point is itself -> difference part is 0, center part = x
    np.testing.assert_allclose(out[:, :5, :, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(out[:, 5:, :, 0], x, atol=1e-5)


def test_subsample_pc(key, rng):
    pc = rng.randn(50, 3).astype(np.float32)
    out = np.asarray(ops.subsample_pc(key, jnp.asarray(pc), jnp.int32(50), 16))
    assert out.shape == (16, 3)
    # each row must be one of the input rows
    d = ((out[:, None, :] - pc[None]) ** 2).sum(-1).min(1)
    assert d.max() < 1e-9
    # <3 valid points -> zeros
    out2 = np.asarray(ops.subsample_pc(key, jnp.asarray(pc), jnp.int32(2), 16))
    np.testing.assert_array_equal(out2, 0.0)


def test_chamfer_distance_zero_and_symmetry(rng):
    x = rng.randn(2, 20, 3).astype(np.float32)
    self_d = float(ops.chamfer_distance(jnp.asarray(x), jnp.asarray(x)))
    assert self_d < 1e-6
    y = rng.randn(2, 30, 3).astype(np.float32)
    a = float(ops.chamfer_distance(jnp.asarray(x), jnp.asarray(y)))
    # brute force
    d = np_square_distance(x, y)
    want = (d.min(2).mean(1) + d.min(1).mean(1)).mean()
    np.testing.assert_allclose(a, want, rtol=1e-4)


def test_linear_attention_matches_naive(rng):
    B, L, S, H, D = 2, 6, 5, 2, 4
    q = rng.randn(B, L, H, D).astype(np.float32)
    k = rng.randn(B, S, H, D).astype(np.float32)
    v = rng.randn(B, S, H, D).astype(np.float32)
    got = np.asarray(ops.linear_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

    def fm(x):
        return np.where(x > 0, x, np.expm1(x)) + 1.0

    Q, K = fm(q), fm(k)
    want = np.zeros((B, L, H, D), np.float32)
    for b in range(B):
        for h in range(H):
            A = Q[b, :, h] @ K[b, :, h].T                  # (L,S)
            Z = A.sum(-1, keepdims=True) + 1e-6
            want[b, :, h] = (A / Z) @ v[b, :, h]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_linear_attention_kv_mask(rng):
    B, L, S, H, D = 1, 4, 6, 1, 4
    q = rng.randn(B, L, H, D).astype(np.float32)
    k = rng.randn(B, S, H, D).astype(np.float32)
    v = rng.randn(B, S, H, D).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0, 0]], np.float32)
    got = np.asarray(ops.linear_attention(jnp.asarray(q), jnp.asarray(k),
                                          jnp.asarray(v), kv_mask=jnp.asarray(mask)))
    ref = np.asarray(ops.linear_attention(jnp.asarray(q), jnp.asarray(k[:, :3]),
                                          jnp.asarray(v[:, :3])))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-5)


def test_index_points_onehot_matmul_exact():
    """The TPU one-hot-matmul gather must reproduce take_along_axis
    bit-for-bit (single 1.0 per selector row), incl. bf16 values."""
    from point_cloud_reid_tpu.ops.geometry import index_points
    rs = np.random.RandomState(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        pts = jnp.asarray(rs.randn(4, 37, 11), dtype)
        idx = jnp.asarray(rs.randint(0, 37, size=(4, 5, 9)), jnp.int32)
        a = index_points(pts, idx, method="gather")
        b = index_points(pts, idx, method="onehot")
        assert a.dtype == b.dtype == dtype
        assert bool(jnp.all(a == b))


def test_index_points_onehot_split_exact(monkeypatch):
    """Oversized selectors split into unrolled K-slices: same result (and
    adjoint) as the single-einsum one-hot and the native gather."""
    from point_cloud_reid_tpu.ops import geometry
    rs = np.random.RandomState(1)
    pts = jnp.asarray(rs.randn(3, 29, 7), jnp.float32)
    idx = jnp.asarray(rs.randint(0, 29, size=(3, 8, 6)), jnp.int32)
    ref = geometry.index_points(pts, idx, method="onehot")
    # selector = 3*48*29*4 = 16.7 KB; a 5 KB budget forces the 4-way split
    monkeypatch.setattr(geometry, "_SELECTOR_BUDGET_BYTES", 5_000)
    got = geometry.index_points(pts, idx, method="onehot")
    assert bool(jnp.all(got == ref))
    ct = jnp.asarray(rs.randn(3, 8, 6, 7), jnp.float32)
    g_split = jax.grad(lambda p: jnp.sum(
        geometry.index_points(p, idx, method="onehot") * ct))(pts)
    monkeypatch.setattr(geometry, "_SELECTOR_BUDGET_BYTES", 1 << 30)
    g_one = jax.grad(lambda p: jnp.sum(
        geometry.index_points(p, idx, method="onehot") * ct))(pts)
    np.testing.assert_allclose(np.asarray(g_split), np.asarray(g_one),
                               rtol=1e-6, atol=1e-6)
