"""Equivalence tests for the fused-residual train-mode SA chain (ops/sa_train).

The custom-VJP op must match the plain flax path on three axes: forward
outputs, the BatchNorm batch statistics (and running-stat updates), and the
gradients of every differentiable input and parameter. Ties (duplicated
neighbor indices -> exact max-over-k ties) are covered explicitly since the
backward reimplements JAX's even tie-split by hand.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_cloud_reid_tpu.models.point_transformer import SetAbstractionEdgeSA
from point_cloud_reid_tpu.ops.sa_train import (_pop_stats, sa_train_pooled,
                                               sa_train_reference)

CFG = (1e-5, "float32")


def _op_inputs(seed=0, B=3, N=24, S=12, K=8, C=16, dup=True):
    rs = np.random.RandomState(seed)
    A = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
    Ct = jnp.asarray(rs.randn(B, S, C).astype(np.float32))
    idx = rs.randint(0, N, size=(B, S, K))
    if dup:
        idx[:, :, K // 2:] = idx[:, :, :K - K // 2]   # exact max ties
    idx = jnp.asarray(idx.astype(np.int32))
    w2 = jnp.asarray(rs.randn(C, C).astype(np.float32) * 0.3)
    b2 = jnp.asarray(rs.randn(C).astype(np.float32) * 0.1)
    w3 = jnp.asarray(rs.randn(C, C).astype(np.float32) * 0.3)
    b3 = jnp.asarray(rs.randn(C).astype(np.float32) * 0.1)
    bn = [jnp.asarray(rs.rand(C).astype(np.float32) + 0.5) for _ in range(3)]
    bb = [jnp.asarray(rs.randn(C).astype(np.float32) * 0.1) for _ in range(3)]
    return (A, Ct, idx, w2, b2, w3, b3,
            bn[0], bb[0], bn[1], bb[1], bn[2], bb[2])


def test_forward_matches_reference():
    args = _op_inputs()
    out, stats = jax.jit(lambda *a: sa_train_pooled(CFG, *a))(*args)
    out_r, stats_r = jax.jit(lambda *a: sa_train_reference(CFG, *a))(*args)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_r))
    for (m, v), (mr, vr) in zip(stats, stats_r):
        np.testing.assert_array_equal(np.asarray(m), np.asarray(mr))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(vr))


@pytest.mark.parametrize("dup", [False, True])
def test_gradients_match_autodiff(dup):
    """Custom backward vs plain autodiff of the same forward math."""
    args = _op_inputs(dup=dup)
    rs = np.random.RandomState(7)
    wout = jnp.asarray(rs.randn(3, 12, 16).astype(np.float32))

    def loss_custom(*a):
        out, _ = sa_train_pooled(CFG, args[0], args[1], args[2], *a)
        return jnp.sum(out * wout)

    def loss_ref(*a):
        out, _ = sa_train_reference(CFG, args[0], args[1], args[2], *a)
        return jnp.sum(out * wout)

    diff = args[3:]
    g_c = jax.jit(jax.grad(loss_custom, argnums=tuple(range(len(diff)))))(*diff)
    g_r = jax.jit(jax.grad(loss_ref, argnums=tuple(range(len(diff)))))(*diff)
    for a, b in zip(g_c, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    # grads w.r.t. the data inputs A / Ct
    gA_c, gCt_c = jax.jit(jax.grad(
        lambda A, Ct: jnp.sum(sa_train_pooled(CFG, A, Ct, *args[2:])[0] * wout),
        argnums=(0, 1)))(args[0], args[1])
    gA_r, gCt_r = jax.jit(jax.grad(
        lambda A, Ct: jnp.sum(sa_train_reference(CFG, A, Ct, *args[2:])[0] * wout),
        argnums=(0, 1)))(args[0], args[1])
    np.testing.assert_allclose(np.asarray(gA_c), np.asarray(gA_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gCt_c), np.asarray(gCt_r),
                               rtol=2e-4, atol=2e-5)


def _module_pair(D=10, C1=16, K=8, vjp=True):
    kw = dict(mlp=[3 + 2 * D, C1, C1, C1], nsample=K)
    fused = SetAbstractionEdgeSA(fused_train=True, fused_train_vjp=vjp, **kw)
    plain = SetAbstractionEdgeSA(fused_train=False, **kw)
    return fused, plain


@pytest.mark.parametrize("vjp", [True, False])
def test_module_forward_and_stats_match(vjp):
    """Fused vs unfused SetAbstractionEdgeSA in train mode: outputs and
    updated batch_stats agree (up to float reassociation)."""
    rs = np.random.RandomState(1)
    B, N, S, D = 3, 24, 12, 10
    xyz = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
    pts = jnp.asarray(rs.randn(B, N, D).astype(np.float32))
    fused, plain = _module_pair(D=D, vjp=vjp)
    v = plain.init(jax.random.PRNGKey(0), xyz, pts, S, train=True)

    h_f, mut_f = fused.apply(v, xyz, pts, S, train=True,
                             mutable=["batch_stats"])
    h_p, mut_p = plain.apply(v, xyz, pts, S, train=True,
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(h_f[1]), np.asarray(h_p[1]),
                               rtol=2e-4, atol=2e-5)
    fl_f = jax.tree_util.tree_leaves_with_path(mut_f)
    fl_p = jax.tree_util.tree_leaves_with_path(mut_p)
    assert [p for p, _ in fl_f] == [p for p, _ in fl_p]
    for (path, a), (_, b) in zip(fl_f, fl_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=str(path))


@pytest.mark.parametrize("vjp", [True, False])
def test_module_gradients_match(vjp):
    rs = np.random.RandomState(2)
    B, N, S, D = 3, 24, 12, 10
    xyz = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
    pts = jnp.asarray(rs.randn(B, N, D).astype(np.float32))
    fused, plain = _module_pair(D=D, vjp=vjp)
    v = plain.init(jax.random.PRNGKey(0), xyz, pts, S, train=True)
    params = v["params"]

    def loss(mod, p, x):
        out, _ = mod.apply({"params": p}, xyz, x, S, train=True,
                           mutable=["batch_stats"])
        return jnp.sum(jnp.square(out[1]))

    gp_f, gx_f = jax.jit(jax.grad(
        lambda p, x: loss(fused, p, x), argnums=(0, 1)))(params, pts)
    gp_p, gx_p = jax.jit(jax.grad(
        lambda p, x: loss(plain, p, x), argnums=(0, 1)))(params, pts)
    fl_f = jax.tree_util.tree_leaves_with_path(gp_f)
    fl_p = jax.tree_util.tree_leaves_with_path(gp_p)
    assert [p for p, _ in fl_f] == [p for p, _ in fl_p]
    for (path, a), (_, b) in zip(fl_f, fl_p):
        keys = [getattr(k, "key", "") for k in path]
        if "conv" in keys and "bias" in keys:
            # a conv bias is a constant shift into a train-mode BatchNorm: the
            # batch mean cancels it exactly, so the true gradient is 0 and
            # both paths produce only float-reassociation noise around it —
            # compare with a pure absolute tolerance
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, err_msg=str(path))
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5, err_msg=str(path))
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_p),
                               rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("vjp", [True, False])
def test_params_only_apply_creates_batch_stats(vjp):
    """Applying with params only (no batch_stats input) must create the same
    running-stat tree as plain flax BN does on the fly (review finding:
    update_stats used to silently skip when the variables were absent)."""
    rs = np.random.RandomState(5)
    B, N, S, D = 2, 16, 8, 6
    xyz = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
    pts = jnp.asarray(rs.randn(B, N, D).astype(np.float32))
    fused, plain = _module_pair(D=D, vjp=vjp)
    v = plain.init(jax.random.PRNGKey(0), xyz, pts, S, train=True)
    params_only = {"params": v["params"]}
    _, mut_f = fused.apply(params_only, xyz, pts, S, train=True,
                           mutable=["batch_stats"])
    _, mut_p = plain.apply(params_only, xyz, pts, S, train=True,
                           mutable=["batch_stats"])
    fl_f = jax.tree_util.tree_leaves_with_path(mut_f)
    fl_p = jax.tree_util.tree_leaves_with_path(mut_p)
    assert fl_f and [p for p, _ in fl_f] == [p for p, _ in fl_p]
    for (path, a), (_, b) in zip(fl_f, fl_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=str(path))


def test_full_model_train_step_fused_matches_plain():
    """Full-model integration: one train step with backbone fused_train=True
    vs the default produces the same loss/grad-norm and batch stats (the
    update_stats write-through path on the real model)."""
    from point_cloud_reid_tpu.models import build_model
    from point_cloud_reid_tpu.train import (TrainState, build_optimizer,
                                            make_train_step)
    from point_cloud_reid_tpu.train.schedules import ScheduleConfig

    cfg = dict(
        type="ReIDNet",
        backbone=dict(type="Pointnet_Backbone", input_channels=0,
                      use_xyz=True, conv_out=8, mul=1, nsample=[4, 4, 4]),
        match_head=[dict(type="LinearRes", n_in=16, n_out=16, norm="GN",
                         ng=8),
                    dict(type="Linear", out_features=1)],
        cross_stage1=dict(type="corss_attention", d_model=8, nhead=2),
        cross_stage2=dict(type="corss_attention", d_model=8, nhead=2),
        match_type="xcorr_eff", pool_type="both", combine="point-cat",
        backbone_list=[8, 4, 2], output_sequence_size=8, hidden_size=16,
    )
    r = jax.random.PRNGKey(0)
    B, N = 8, 12
    batch = dict(sparse_1=jax.random.normal(r, (B, N, 3)),
                 sparse_2=jax.random.normal(jax.random.PRNGKey(1), (B, N, 3)),
                 label_1=jnp.zeros((B,), jnp.int32),
                 label_2=jnp.ones((B,), jnp.int32),
                 id_1=jnp.arange(B, dtype=jnp.int32),
                 id_2=jnp.arange(B, dtype=jnp.int32) % 3)
    tx = build_optimizer(ScheduleConfig(max_epochs=1), steps_per_epoch=2)

    logs, stats = [], []
    for fused in (False, True):
        c = dict(cfg)
        c["backbone"] = dict(cfg["backbone"], fused_train=fused)
        model = build_model(c)
        state = TrainState.create(model, tx, batch, rng=jax.random.PRNGKey(2))
        step = jax.jit(make_train_step(model, tx, dict(match=True), {},
                                       donate=False))
        new_state, log = step(state, batch, jax.random.PRNGKey(3))
        logs.append(log)
        stats.append(new_state.batch_stats)
    np.testing.assert_allclose(float(logs[1]["reid_loss"]),
                               float(logs[0]["reid_loss"]),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(logs[1]["grad_norm"]),
                               float(logs[0]["grad_norm"]),
                               rtol=2e-4, atol=2e-5)
    fl_f = jax.tree_util.tree_leaves_with_path(stats[1])
    fl_p = jax.tree_util.tree_leaves_with_path(stats[0])
    assert [p for p, _ in fl_f] == [p for p, _ in fl_p]
    for (path, a), (_, b) in zip(fl_f, fl_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=str(path))


def test_pop_stats_matches_flax_convention():
    rs = np.random.RandomState(4)
    h = jnp.asarray(rs.randn(3, 5, 4, 8).astype(np.float32) * 2 + 1)
    m, v = _pop_stats(h)
    np.testing.assert_allclose(np.asarray(m), np.asarray(h).mean((0, 1, 2)),
                               rtol=1e-5)
    # flax use_fast_variance: E[x^2] - E[x]^2 (biased)
    ref_v = (np.asarray(h) ** 2).mean((0, 1, 2)) - np.asarray(h).mean((0, 1, 2)) ** 2
    np.testing.assert_allclose(np.asarray(v), ref_v, rtol=1e-4, atol=1e-5)
