"""Model-layer tests: ReIDNet forwards for every match type + loss zoo.

Tiny shapes keep single-core CPU compiles tolerable; shape/finiteness invariants
mirror the reference call stack (SURVEY.md §3.4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import chex

from point_cloud_reid_tpu.models import ReIDNet, ReIDNetCosine
from point_cloud_reid_tpu.train.losses import (bce_with_logits, kl_pair_loss,
                                               reid_losses, smooth_l1,
                                               softmax_ce, triplet_loss)

B, N = 2, 32
NUMPOINTS = [16, 8, 4]


def tiny_model(match_type="xcorr_eff", combine="point-cat", cosine=False):
    cls = ReIDNetCosine if cosine else ReIDNet
    d = 64
    head_in = {"xcorr_eff": {"point-cat": 2 * d, "cat": 4 * d, "add": 2 * d,
                             "minus": 2 * d}[combine],
               "xcorr": 2 * d, "xcorr-baseline": 2 * d,
               "concat": 4 * d}[match_type]
    return cls(
        backbone=dict(type="Pointnet_Backbone", conv_out=d),
        match_head=[dict(type="LinearRes", n_in=head_in, n_out=64, ng=32),
                    dict(type="Linear", out_features=1)],
        cross_stage1=dict(type="corss_attention", d_model=d, nhead=2),
        cross_stage2=dict(type="corss_attention", d_model=d, nhead=2),
        local_stage1=dict(type="local_self_attention", d_model=d, nhead=2,
                          knum=4, pos_size=d),
        local_stage2=dict(type="local_self_attention", d_model=d, nhead=2,
                          knum=4, pos_size=d),
        match_type=match_type, combine=combine, pool_type="both",
        backbone_list=NUMPOINTS,
    )


def make_batch(key):
    k1, k2 = jax.random.split(key)
    return dict(
        sparse_1=jax.random.normal(k1, (B, N, 3)),
        sparse_2=jax.random.normal(k2, (B, N, 3)),
        label_1=jnp.array([1, 2]), label_2=jnp.array([1, 12]),
        id_1=jnp.array([3, 4]), id_2=jnp.array([3, -1]),
    )


@pytest.mark.parametrize("match_type,combine", [
    ("xcorr_eff", "point-cat"), ("xcorr_eff", "add"),
    ("concat", "point-cat"),
])
def test_reidnet_match_types(match_type, combine):
    model = tiny_model(match_type, combine)
    batch = make_batch(jax.random.PRNGKey(0))
    v = model.init(jax.random.PRNGKey(1), batch, train=False)
    out = model.apply(v, batch, train=False)
    assert out["match_logits"].shape == (B,)
    assert out["h1"].shape == (B, N, 64)
    assert np.isfinite(np.asarray(out["match_logits"])).all()
    # match supervision = (id_1 == id_2) (ReIDNet.py:338-346)
    np.testing.assert_array_equal(np.asarray(out["match"]), [1.0, 0.0])


def test_reidnet_cosine_bounded():
    model = tiny_model(cosine=True)
    batch = make_batch(jax.random.PRNGKey(0))
    v = model.init(jax.random.PRNGKey(1), batch, train=False)
    out = model.apply(v, batch, train=False)
    logits = np.asarray(out["match_logits"])
    assert (np.abs(logits) <= 10.0 + 1e-4).all()  # 10x cosine scale


def test_loss_primitives_match_torch_semantics():
    # golden values computed from the definitions
    logits = jnp.array([0.0, 2.0, -2.0])
    targets = jnp.array([1.0, 1.0, 0.0])
    want = np.mean([np.log(2), np.log1p(np.exp(-2.0)),
                    np.log1p(np.exp(-2.0))])
    np.testing.assert_allclose(float(bce_with_logits(logits, targets)), want,
                               rtol=1e-6)

    cls_logits = jnp.array([[2.0, 0.0], [0.0, 2.0]])
    labels = jnp.array([0, 1])
    want_ce = float(np.log(1 + np.exp(-2.0)))
    np.testing.assert_allclose(float(softmax_ce(cls_logits, labels)), want_ce,
                               rtol=1e-6)

    np.testing.assert_allclose(
        float(smooth_l1(jnp.array([0.5, 3.0]), jnp.array([0.0, 0.0]))),
        np.mean([0.5 * 0.25, 2.5]), rtol=1e-6)


def test_kl_pair_loss_sign():
    h_same = jnp.ones((2, 4, 8))
    # identical features -> zero kl
    np.testing.assert_allclose(
        float(kl_pair_loss(h_same, h_same, jnp.array([1.0, 0.0]))), 0.0,
        atol=1e-6)


def test_triplet_loss_zero_when_far_negatives():
    rng = jax.random.PRNGKey(0)
    h1 = jnp.zeros((2, 4))
    h2 = jnp.zeros((2, 4))          # anchor == positive -> d_ap = 0
    # all other ids equal -> negatives sampled from other rows that are far
    h1 = h1.at[1].set(100.0)
    h2 = h2.at[1].set(100.0)
    loss = triplet_loss(rng, h1, h2, jnp.array([1, 2]), jnp.array([1, 2]),
                        match=jnp.array([1.0, 1.0]), sample_num=3, margin=0.2)
    # d_ap=0, d_an >= 100 >> margin -> loss 0
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-5)


def test_reid_losses_aggregate():
    model = tiny_model()
    batch = make_batch(jax.random.PRNGKey(0))
    batch["dense_1"] = jax.random.normal(jax.random.PRNGKey(5), (B, 64, 3))
    batch["dense_2"] = jax.random.normal(jax.random.PRNGKey(6), (B, 64, 3))
    v = model.init(jax.random.PRNGKey(1), batch, train=False)
    out = model.apply(v, batch, train=False)
    total, log = reid_losses(
        out, batch, losses_to_use=dict(match=True, kl=True, triplet=True),
        alpha=dict(match=2.0), rng=jax.random.PRNGKey(7))
    assert np.isfinite(float(total))
    # alpha scaling: match_loss already includes the 2x weight
    assert "match_loss" in log and "kl_loss" in log and "triplet_loss" in log
    np.testing.assert_allclose(
        float(total),
        float(log["match_loss"] + log["kl_loss"] + log["triplet_loss"]),
        rtol=1e-5)


def test_sa_edge_split_matches_materialized():
    """The factored first-conv path (edge_split=True) must match the
    materialized edge-tensor path up to float reassociation."""
    from point_cloud_reid_tpu.models.point_transformer import (
        SetAbstractionEdgeSA)
    rs = np.random.RandomState(0)
    B, N, S, K, D, C1 = 3, 24, 12, 8, 10, 16
    xyz = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
    pts = jnp.asarray(rs.randn(B, N, D).astype(np.float32))
    kw = dict(mlp=[3 + 2 * D, C1, C1, C1], nsample=K)
    split = SetAbstractionEdgeSA(edge_split=True, **kw)
    naive = SetAbstractionEdgeSA(edge_split=False, **kw)
    v = split.init(jax.random.PRNGKey(0), xyz, pts, S, train=False)
    v2 = naive.init(jax.random.PRNGKey(0), xyz, pts, S, train=False)
    # identical param trees (same shapes, same rng paths)
    chex.assert_trees_all_equal_shapes(v, v2)
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    xs, hs = split.apply(v, xyz, pts, S, train=False)
    xn, hn = naive.apply(v, xyz, pts, S, train=False)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(xn))
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hn),
                               rtol=2e-4, atol=2e-5)


def test_bf16_mixed_precision_train_step():
    """--bf16 mixed precision (tools/train.py:115): bf16 compute dtype with
    f32 params (flax dtype vs param_dtype split; reference Fp16OptimizerHook
    + LossScaler, apis/train.py:81-94 — no loss scaling needed for bf16).
    One train step must keep every param and optimizer-state leaf in f32 and
    produce finite loss/grad-norm."""
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
    model = build_model(cfg, dtype=jnp.bfloat16)
    r = jax.random.PRNGKey(0)
    B, Np = 4, 12
    batch = dict(sparse_1=jax.random.normal(r, (B, Np, 3)),
                 sparse_2=jax.random.normal(jax.random.PRNGKey(1),
                                            (B, Np, 3)),
                 label_1=jnp.zeros((B,), jnp.int32),
                 label_2=jnp.ones((B,), jnp.int32),
                 id_1=jnp.arange(B, dtype=jnp.int32),
                 id_2=jnp.arange(B, dtype=jnp.int32) % 3)
    tx = build_optimizer(ScheduleConfig(max_epochs=1), steps_per_epoch=2)
    state = TrainState.create(model, tx, batch, rng=jax.random.PRNGKey(2))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    step = jax.jit(make_train_step(model, tx, dict(match=True), {},
                                   donate=False))
    new_state, log = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(log["reid_loss"]))
    assert np.isfinite(float(log["grad_norm"]))
    for leaf in jax.tree_util.tree_leaves(new_state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(new_state.opt_state):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            assert leaf.dtype == jnp.float32
    # bf16 compute actually engaged: the eval forward emits bf16 logits
    out = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      batch, train=False)
    assert out["match_logits"].dtype == jnp.bfloat16


def test_backbone_stage_remat_matches():
    """remat_stages recomputes an SA stage's grouped chain in backward
    (VERDICT r4 item 6's recompute-cheapest-stage experiment knob). It must
    be semantically invisible: same forward, bit-identical batch-stats
    updates, gradients equal up to float reassociation."""
    from point_cloud_reid_tpu.models.point_transformer import (
        PointTransformerBackbone)
    rng = jax.random.PRNGKey(0)
    pts = jax.random.normal(rng, (4, 64, 3))
    nps = [32, 16, 8]

    def run(remat):
        m = PointTransformerBackbone(mul=1, remat_stages=remat)
        v = m.init(jax.random.PRNGKey(1), pts, nps, train=True)

        def loss(p):
            (_, out), upd = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                pts, nps, train=True, mutable=["batch_stats"])
            return jnp.sum(out ** 2), upd

        (l, upd), g = jax.value_and_grad(loss, has_aux=True)(v["params"])
        return v, l, g, upd

    v0, l0, g0, u0 = run(())
    v1, l1, g1, u1 = run((0, 1, 2))
    # the lifted transform must not change param structure or init values
    for a, b in zip(jax.tree_util.tree_leaves(v0),
                    jax.tree_util.tree_leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    for a, b in zip(jax.tree_util.tree_leaves(u0),
                    jax.tree_util.tree_leaves(u1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=2e-4,
                                   atol=2e-4 * max(1.0, np.abs(a).max()))
