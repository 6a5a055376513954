"""Parallel layer: sharding specs, DP invariance, pair-sharded scoring."""
import jax
import jax.numpy as jnp
import numpy as np

from point_cloud_reid_tpu.models import build_model
from point_cloud_reid_tpu.parallel import (allgather_results, barrier,
                                           init_distributed, make_mesh,
                                           replicated, shard_batch)
from point_cloud_reid_tpu.train import (TrainState, build_optimizer,
                                        make_train_step)
from point_cloud_reid_tpu.train.schedules import ScheduleConfig

TINY = dict(
    type="ReIDNet",
    backbone=dict(type="Pointnet_Backbone", input_channels=0, use_xyz=True,
                  conv_out=8, mul=1, nsample=[4, 4, 4]),
    match_head=[dict(type="LinearRes", n_in=16, n_out=16, norm="GN", ng=8),
                dict(type="Linear", out_features=1)],
    cross_stage1=dict(type="corss_attention", d_model=8, nhead=2),
    cross_stage2=dict(type="corss_attention", d_model=8, nhead=2),
    match_type="xcorr_eff", pool_type="both", combine="point-cat",
    backbone_list=[8, 4, 2], output_sequence_size=8, hidden_size=16,
)


def _batch(B=16, N=8):
    r = jax.random.PRNGKey(0)
    return dict(sparse_1=jax.random.normal(r, (B, N, 3)),
                sparse_2=jax.random.normal(jax.random.PRNGKey(1), (B, N, 3)),
                label_1=jnp.zeros((B,), jnp.int32),
                label_2=jnp.ones((B,), jnp.int32),
                id_1=jnp.arange(B, dtype=jnp.int32),
                id_2=jnp.arange(B, dtype=jnp.int32) % 3)


def test_init_distributed_single_process():
    info = init_distributed()
    assert info["process_count"] == 1
    barrier()                                   # no-op, must not raise


def test_allgather_single_process_identity():
    r = {"a": np.arange(6).reshape(3, 2)}
    out = allgather_results(r)
    np.testing.assert_array_equal(out["a"], r["a"])


def test_shard_batch_specs():
    mesh = make_mesh(data=8)
    batch = shard_batch(mesh, _batch(B=16))
    sh = batch["sparse_1"].sharding
    assert sh.spec[0] == "data"


def test_dp_train_step_invariant_to_sharding():
    """One SPMD step on a sharded batch == the same step replicated: XLA's
    collective gradient reduction must not change the math (f32)."""
    model = build_model(TINY)
    batch = _batch(B=16, N=8)
    tx = build_optimizer(ScheduleConfig(max_epochs=1), steps_per_epoch=4)
    state = TrainState.create(model, tx, batch, rng=jax.random.PRNGKey(2))
    step = make_train_step(model, tx, dict(match=True), {}, donate=False)
    rng = jax.random.PRNGKey(3)

    s_single, log_single = step(state, batch, rng)

    mesh = make_mesh(data=8)
    with mesh:
        s0 = jax.device_put(state, replicated(mesh))
        db = shard_batch(mesh, batch)
        s_mesh, log_mesh = step(s0, db, rng)

    np.testing.assert_allclose(float(log_single["reid_loss"]),
                               float(log_mesh["reid_loss"]),
                               rtol=2e-5, atol=2e-5)
    l1 = jax.tree_util.tree_leaves(s_single.params)
    l2 = jax.tree_util.tree_leaves(jax.device_get(s_mesh.params))
    for a, b in zip(l1, l2):
        # Adam normalizes gradients, amplifying f32 reduction-order noise:
        # collective (tree) reduction vs single-device row order (atol sized
        # for the shared-A/Ct edge factoring's reassociation)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-3)


def test_pair_sharded_cost_matrix_matches_unsharded():
    from point_cloud_reid_tpu.inference import PairScorer
    model = build_model(TINY)
    batch = _batch(B=2, N=8)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    crops = jax.random.normal(jax.random.PRNGKey(5), (8, 8, 3))
    plain = PairScorer(model, variables)
    xyz, h = plain.embed(crops)
    ref = np.asarray(plain.cost_matrix(h, xyz, h, xyz, pad=True))

    mesh = make_mesh(data=4, pairs=2)
    sharded = PairScorer(model, variables, mesh=mesh)
    got = np.asarray(sharded.cost_matrix(h, xyz, h, xyz, pad=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fused_frame_matches_two_stage():
    from point_cloud_reid_tpu.inference import PairScorer
    model = build_model(TINY)
    batch = _batch(B=2, N=8)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    scorer = PairScorer(model, variables)

    tracks = jax.random.normal(jax.random.PRNGKey(6), (4, 8, 3))
    dets = jax.random.normal(jax.random.PRNGKey(7), (6, 8, 3))
    xyz_t, h_t = scorer.embed(tracks)
    xyz_d, h_d = scorer.embed(dets)
    ref = np.asarray(scorer.cost_matrix(h_t, xyz_t, h_d, xyz_d, pad=False))

    frame_fn = scorer.make_frame_fn(4, 6)
    got, h_d2, _ = frame_fn(h_t, xyz_t, dets)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_d2), np.asarray(h_d),
                               rtol=1e-6, atol=1e-6)


def test_pair_sharded_non_divisible_grid():
    """Grids that don't divide the device count still score correctly —
    GSPMD pads shards internally; no silent unsharded fallback."""
    from point_cloud_reid_tpu.inference import PairScorer
    model = build_model(TINY)
    batch = _batch(B=2, N=8)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    crops_t = jax.random.normal(jax.random.PRNGKey(8), (5, 8, 3))
    crops_d = jax.random.normal(jax.random.PRNGKey(9), (3, 8, 3))
    plain = PairScorer(model, variables)
    xyz_t, h_t = plain.embed(crops_t)
    xyz_d, h_d = plain.embed(crops_d)
    # pad=False: 5x3=15 pairs over 8 devices — not divisible
    ref = np.asarray(plain.cost_matrix(h_t, xyz_t, h_d, xyz_d, pad=False))

    mesh = make_mesh(data=4, pairs=2)
    sharded = PairScorer(model, variables, mesh=mesh)
    got = np.asarray(sharded.cost_matrix(h_t, xyz_t, h_d, xyz_d, pad=False))
    assert got.shape == (5, 3)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pair_sharded_large_grid():
    """>=4096-pair grid scored through the in-program sharded broadcast;
    per-shard peak memory stays ~1/n_devices of the full grid."""
    from point_cloud_reid_tpu.inference import PairScorer
    model = build_model(TINY)
    batch = _batch(B=2, N=8)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    crops = jax.random.normal(jax.random.PRNGKey(10), (64, 8, 3))
    mesh = make_mesh(data=4, pairs=2)
    sharded = PairScorer(model, variables, mesh=mesh)
    xyz, h = sharded.embed(crops)
    mat = np.asarray(sharded.cost_matrix(h, xyz, h, xyz, pad=False))
    assert mat.shape == (64, 64)            # 4096 pairs
    assert np.isfinite(mat).all()
    # spot-check a row block against the unsharded scorer
    plain = PairScorer(model, variables)
    ref = np.asarray(plain.cost_matrix(h[:8], xyz[:8], h, xyz, pad=False))
    np.testing.assert_allclose(mat[:8], ref, rtol=1e-5, atol=1e-5)


def test_fused_frame_fn_sharded():
    """make_frame_fn honors the mesh: fused embed+grid matches unsharded."""
    from point_cloud_reid_tpu.inference import PairScorer
    model = build_model(TINY)
    batch = _batch(B=2, N=8)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    tracks = jax.random.normal(jax.random.PRNGKey(11), (4, 8, 3))
    dets = jax.random.normal(jax.random.PRNGKey(12), (6, 8, 3))
    plain = PairScorer(model, variables)
    xyz_t, h_t = plain.embed(tracks)
    ref, h_ref, _ = plain.make_frame_fn(4, 6)(h_t, xyz_t, dets)

    mesh = make_mesh(data=4, pairs=2)
    sharded = PairScorer(model, variables, mesh=mesh)
    got, h_got, _ = sharded.make_frame_fn(4, 6)(h_t, xyz_t, dets)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)


def test_score_frame_zero_tracks():
    """Scene-start frame with no active tracks returns an empty cost matrix
    instead of crashing in FeatureCache.gather."""
    import jax
    import jax.numpy as jnp
    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.inference import FeatureCache, PairScorer
    from point_cloud_reid_tpu.models import build_model

    cfg = get_experiment("pts_point-transformer_point-cat_nus_det_4x256_500e")
    model = build_model(dict(cfg["model"]))
    rng = jax.random.PRNGKey(0)
    batch = dict(sparse_1=jax.random.normal(rng, (2, 16, 3)),
                 sparse_2=jax.random.normal(rng, (2, 16, 3)),
                 id_1=jnp.zeros((2,), jnp.int32),
                 id_2=jnp.zeros((2,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)
    scorer = PairScorer(model, variables)
    dets = jax.random.normal(jax.random.PRNGKey(2), (5, 16, 3))
    mat, h_d, xyz_d = scorer.score_frame(FeatureCache(), [], dets)
    assert mat.shape == (0, 5)
    assert h_d.shape[0] == 5


def test_remat_train_step_matches_plain():
    """remat=True (jax.checkpoint) must produce the same loss/grads as the
    plain step — it only changes what is stored vs recomputed."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.models import build_model
    from point_cloud_reid_tpu.train import (TrainState, build_optimizer,
                                            make_train_step)
    from point_cloud_reid_tpu.train.schedules import ScheduleConfig

    cfg = get_experiment("pts_point-transformer_point-cat_nus_det_4x256_500e")
    model = build_model(dict(cfg["model"]))
    B, N = 4, 16
    rng = jax.random.PRNGKey(0)
    batch = dict(sparse_1=jax.random.normal(rng, (B, N, 3)),
                 sparse_2=jax.random.normal(jax.random.PRNGKey(1), (B, N, 3)),
                 label_1=jnp.zeros((B,), jnp.int32),
                 label_2=jnp.ones((B,), jnp.int32),
                 id_1=jnp.arange(B, dtype=jnp.int32),
                 id_2=jnp.arange(B, dtype=jnp.int32) % 2)
    tx = build_optimizer(ScheduleConfig(max_epochs=1), steps_per_epoch=10)
    state = TrainState.create(model, tx, batch, rng=jax.random.PRNGKey(2))
    plain = make_train_step(model, tx, dict(match=True), {}, donate=False)
    remat = make_train_step(model, tx, dict(match=True), {}, donate=False,
                            remat=True)
    s1, log1 = jax.jit(plain)(state, batch, jax.random.PRNGKey(3))
    s2, log2 = jax.jit(remat)(state, batch, jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(log1["reid_loss"]),
                               float(log2["reid_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
