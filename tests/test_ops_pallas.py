"""Pallas kernels vs. XLA reference implementations (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_cloud_reid_tpu.ops import (farthest_point_sample, knn_indices,
                                      linear_attention)
from point_cloud_reid_tpu.ops.pallas import (fps_pallas, knn_pallas,
                                             linear_attention_pallas)


@pytest.mark.parametrize("B,S,N,k", [(2, 16, 64, 8), (3, 32, 64, 48)])
def test_knn_pallas_matches_argsort(B, S, N, k):
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    new_xyz = jnp.asarray(rng.randn(B, S, 3), jnp.float32)
    ref = knn_indices(k, xyz, new_xyz, method="argsort")
    got = knn_pallas(new_xyz, xyz, k)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_knn_pallas_tie_breaking_duplicates():
    # resample-with-replacement duplicates points; first occurrence must win
    rng = np.random.RandomState(1)
    base = rng.randn(1, 8, 3)
    xyz = jnp.asarray(np.concatenate([base, base], axis=1), jnp.float32)
    q = jnp.asarray(base[:, :4], jnp.float32)
    ref = knn_indices(6, xyz, q, method="argsort")
    got = knn_pallas(q, xyz, 6)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fps_pallas_matches_xla():
    rng = np.random.RandomState(2)
    xyz = jnp.asarray(rng.randn(3, 64, 3), jnp.float32)
    ref = farthest_point_sample(xyz, 16, deterministic_start=True)
    got = fps_pallas(xyz, 16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fps_pallas_spread():
    # FPS on a line must pick the extremes early
    xs = jnp.linspace(0.0, 1.0, 32)
    xyz = jnp.stack([xs, jnp.zeros_like(xs), jnp.zeros_like(xs)], -1)[None]
    idx = np.asarray(fps_pallas(xyz, 3))[0]
    assert idx[0] == 0 and idx[1] == 31 and idx[2] in (15, 16)


@pytest.mark.parametrize("B,L,S,H,D,V", [(2, 16, 24, 4, 8, 8), (1, 33, 17, 1, 16, 16)])
def test_linear_attention_pallas_forward(B, L, S, H, D, V):
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, H, V), jnp.float32)
    ref = linear_attention(q, k, v)
    got = linear_attention_pallas(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_linear_attention_pallas_grad():
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(1, 8, 2, 4), jnp.float32)
    k = jnp.asarray(rng.randn(1, 12, 2, 4), jnp.float32)
    v = jnp.asarray(rng.randn(1, 12, 2, 4), jnp.float32)

    def loss_pallas(q, k, v):
        return jnp.sum(linear_attention_pallas(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(linear_attention(q, k, v) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_fused_sa_stage_matches_xla():
    """Fused SA-stage kernel (ops/pallas/sa_stage, interpret mode) == the
    XLA SetAbstractionEdgeSA eval path, both with and without input
    features, at bf16 and f32."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from point_cloud_reid_tpu.models.point_transformer import (
        SetAbstractionEdgeSA)

    rng = jax.random.PRNGKey(0)
    B, N, S, K, C = 3, 32, 16, 8, 16
    xyz = jax.random.normal(rng, (B, N, 3))
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, N, C))

    for points, cin in ((None, 3), (feats, C + 3 + C - 3)):
        for dt, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)):
            in_dim = 3 if points is None else 3 + 2 * C
            ref_mod = SetAbstractionEdgeSA(mlp=[in_dim - 3, C, C, C],
                                           nsample=K, dtype=dt)
            v = ref_mod.init(jax.random.PRNGKey(2), xyz, points, S,
                             train=False)
            ref = ref_mod.apply(v, xyz, points, S, train=False)
            fused_mod = SetAbstractionEdgeSA(mlp=[in_dim - 3, C, C, C],
                                             nsample=K, dtype=dt,
                                             pallas_inference=True,
                                             pallas_interpret=True)
            out = fused_mod.apply(v, xyz, points, S, train=False)
            np.testing.assert_allclose(np.asarray(out[0], np.float32),
                                       np.asarray(ref[0], np.float32))
            np.testing.assert_allclose(np.asarray(out[1], np.float32),
                                       np.asarray(ref[1], np.float32),
                                       rtol=tol, atol=tol)


def test_fused_backbone_matches_xla():
    """Whole PointTransformerBackbone with pallas_inference on (interpret)
    == the XLA backbone in eval mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from point_cloud_reid_tpu.models.point_transformer import (
        PointTransformerBackbone)

    B, N = 2, 32
    pts = jax.random.normal(jax.random.PRNGKey(3), (B, N, 3))
    ref_mod = PointTransformerBackbone(conv_out=16, mul=1, nsample=(8, 8, 8))
    v = ref_mod.init(jax.random.PRNGKey(4), pts, [16, 8, 4], train=False)
    ref_xyz, ref_h = ref_mod.apply(v, pts, [16, 8, 4], train=False)
    fused_mod = PointTransformerBackbone(conv_out=16, mul=1,
                                         nsample=(8, 8, 8),
                                         pallas_inference=True,
                                         pallas_interpret=True)
    out_xyz, out_h = fused_mod.apply(v, pts, [16, 8, 4], train=False)
    np.testing.assert_allclose(np.asarray(out_xyz), np.asarray(ref_xyz))
    np.testing.assert_allclose(np.asarray(out_h, np.float32),
                               np.asarray(ref_h, np.float32),
                               rtol=2e-4, atol=2e-5)
