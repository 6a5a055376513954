"""Tracking subsystem: crops, association, supervision, end-to-end identity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_cloud_reid_tpu.tracking import (TrackingManager, TrackStore,
                                           associate, association_margin_loss,
                                           center_distance_gate,
                                           extract_box_crops,
                                           sigmoid_focal_loss,
                                           softmax_association_loss)


def test_extract_box_crops_membership_and_centering():
    rng = np.random.RandomState(0)
    # box at (5, 5, 0), size 2x2x2, yaw 0; 50 points inside, 100 far away
    inside = rng.uniform(-0.9, 0.9, (50, 3)) + np.array([5.0, 5.0, 0.0])
    outside = rng.uniform(20, 30, (100, 3))
    pts = np.concatenate([inside, outside]).astype(np.float32)
    boxes = np.array([[5, 5, 0, 2, 2, 2, 0.0],
                      [100, 100, 0, 2, 2, 2, 0.0]], np.float32)
    crops, counts = extract_box_crops(jax.random.PRNGKey(0), jnp.asarray(pts),
                                      jnp.asarray(boxes), subsample_number=64)
    counts = np.asarray(counts)
    assert counts[0] == 50 and counts[1] == 0
    c0 = np.asarray(crops[0])
    assert np.all(np.abs(c0) <= 1.0 + 1e-5)          # centered in box frame
    assert np.all(np.asarray(crops[1]) == 0)         # empty box -> zeros


def test_extract_box_crops_yaw():
    # point at angle yaw from center must land on the +x axis in box frame
    yaw = 0.7
    center = np.array([1.0, 2.0, 0.0])
    p = center + np.array([np.cos(yaw), np.sin(yaw), 0.0]) * 0.5
    pts = np.tile(p, (10, 1)).astype(np.float32)
    boxes = np.array([[*center, 2, 2, 2, yaw]], np.float32)
    crops, counts = extract_box_crops(jax.random.PRNGKey(1), jnp.asarray(pts),
                                      jnp.asarray(boxes), subsample_number=8)
    assert int(counts[0]) == 10
    np.testing.assert_allclose(np.asarray(crops[0][0]), [0.5, 0.0, 0.0],
                               atol=1e-5)


@pytest.mark.parametrize("method", ["greedy", "hungarian"])
def test_associate(method):
    cost = np.array([[0.1, 0.9, 0.8],
                     [0.9, 0.2, 0.85],
                     [0.9, 0.9, 0.95]])
    matches, ut, ud = associate(cost, threshold=0.5, method=method)
    assert sorted(matches) == [(0, 0), (1, 1)]
    assert ut == [2] and ud == [2]


@pytest.mark.quick
def test_crop_two_level_rank_matches_flat_searchsorted():
    """The sqrt-decomposed rank lookup in extract_box_crops must select the
    exact same sweep indices as a flat inclusive-cumsum + searchsorted-left
    (the r3 formulation): same rng -> same ranks -> bit-identical crops."""
    from point_cloud_reid_tpu.ops import points_in_rboxes
    from point_cloud_reid_tpu.tracking.crops import extract_box_crops

    rs = np.random.RandomState(5)
    N, M, S = 4096, 12, 16          # N % 512 == 0: the production block size
    pts = jnp.asarray(rs.rand(N, 3).astype(np.float32) * 20 - 10)
    boxes = np.concatenate(
        [rs.rand(M, 3).astype(np.float32) * 16 - 8,
         rs.uniform(0.5, 4.0, (M, 3)).astype(np.float32),
         rs.uniform(-3, 3, (M, 1)).astype(np.float32)], axis=1)
    boxes[-1, :3] = 100.0           # one empty box (soft-failure path)
    boxes = jnp.asarray(boxes)
    rng = jax.random.PRNGKey(9)
    crops, counts = extract_box_crops(rng, pts, boxes, S)
    assert int(counts[-1]) == 0 and np.all(np.asarray(crops[-1]) == 0)

    # flat reference: identical rank draws, flat searchsorted
    boxes_zb = boxes.at[:, 2].add(-boxes[:, 5] * 0.5)
    inside = np.asarray(points_in_rboxes(pts, boxes_zb))
    cnts = inside.sum(axis=0).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(counts), cnts)
    rank = np.cumsum(inside.T.astype(np.int64), axis=1)
    u = np.asarray(jax.random.uniform(rng, (M, S)))
    r = np.minimum(np.floor(u * cnts[:, None]).astype(np.int64),
                   np.maximum(cnts[:, None] - 1, 0))
    idx = np.minimum(
        np.stack([np.searchsorted(rank[m], r[m] + 1, side="left")
                  for m in range(M)]), N - 1)
    pts_np = np.asarray(pts)
    raw = pts_np[idx]
    rel = raw - np.asarray(boxes)[:, None, :3]
    yaw = -np.asarray(boxes)[:, 6]
    c, s = np.cos(yaw), np.sin(yaw)
    want = np.stack([rel[..., 0] * c[:, None] - rel[..., 1] * s[:, None],
                     rel[..., 0] * s[:, None] + rel[..., 1] * c[:, None],
                     rel[..., 2]], axis=-1)
    want[cnts == 0] = 0.0
    np.testing.assert_allclose(np.asarray(crops), want, rtol=1e-6, atol=1e-6)


@pytest.mark.quick
def test_greedy_sorted_sweep_matches_argmin_loop():
    """The O(P log P) sorted-sweep greedy must reproduce the full-matrix
    argmin loop exactly, including first-flat-index tie order (values are
    quantized to force many ties)."""
    from point_cloud_reid_tpu.tracking.association import greedy_assignment

    def argmin_loop(cost, threshold):
        matches = []
        c = cost.copy()
        while True:
            t, d = np.unravel_index(np.argmin(c), c.shape)
            if not np.isfinite(c[t, d]) or c[t, d] > threshold:
                break
            matches.append((int(t), int(d)))
            c[t, :] = np.inf
            c[:, d] = np.inf
        return matches

    rng = np.random.RandomState(7)
    for trial in range(20):
        T, D = rng.randint(1, 40, size=2)
        cost = np.round(rng.rand(T, D), 1)          # 1 decimal -> heavy ties
        cost[rng.rand(T, D) < 0.3] = np.inf         # gated-out cells
        assert (greedy_assignment(cost, 0.7)
                == argmin_loop(cost, 0.7)), (trial, T, D)


def test_associate_gate():
    cost = np.array([[0.1, 0.2]])
    gate = np.array([[False, True]])
    matches, _, _ = associate(cost, threshold=0.5, gate=gate)
    assert matches == [(0, 1)]


def test_center_distance_gate():
    tb = np.array([[0, 0, 0, 1, 1, 1, 0]], np.float32)
    db = np.array([[1, 0, 0, 1, 1, 1, 0], [5, 0, 0, 1, 1, 1, 0]], np.float32)
    g = center_distance_gate(tb, db, max_distance=2.0)
    assert g.tolist() == [[True, False]]


def test_focal_loss_reduces_easy_examples():
    logits = jnp.array([4.0, -4.0])       # confident & correct
    targets = jnp.array([1.0, 0.0])
    easy = sigmoid_focal_loss(logits, targets)
    hard = sigmoid_focal_loss(-logits, targets)
    assert float(easy) < float(hard)


def test_margin_loss_zero_when_separated():
    cost = jnp.array([[0.0, 1.0], [1.0, 0.0]])
    gt = jnp.array([0, 1])
    assert float(association_margin_loss(cost, gt, margin=0.2)) == 0.0
    # violation when gt pair is not the cheapest by margin
    bad = jnp.array([[0.5, 0.45], [1.0, 0.0]])
    assert float(association_margin_loss(bad, gt, margin=0.2)) > 0.0


def test_softmax_association_none_bucket():
    logits = jnp.array([[5.0, -5.0]])
    good = softmax_association_loss(logits, jnp.array([0]))
    none = softmax_association_loss(logits, jnp.array([-1]))
    assert float(good) < float(none)


class _MockScorer:
    """Distance-based stand-in for PairScorer: embeds a crop as its centroid;
    pairs with near-identical centroids score high."""

    def embed(self, crops):
        h = jnp.mean(crops, axis=1, keepdims=True)        # (B, 1, 3)
        return crops[:, :1, :], h

    def cost_matrix(self, h_t, xyz_t, h_d, xyz_d, track_classes=None,
                    det_classes=None, pad=True):
        d = jnp.linalg.norm(h_t[:, 0, None, :] - h_d[None, :, 0, :], axis=-1)
        logits = 8.0 - 16.0 * d
        if track_classes is not None and det_classes is not None:
            ok = (np.asarray(track_classes)[:, None]
                  == np.asarray(det_classes)[None, :])
            logits = jnp.where(jnp.asarray(ok), logits, -jnp.inf)
        return logits


class _MockCachedScorer(_MockScorer):
    """_MockScorer + the DeviceTrackCache frame protocol (un-jitted jnp):
    lets manager-policy tests exercise the device-cache bookkeeping
    (slots, scatters, growth) without compiling real models."""

    image_mode = False

    def make_cached_frame_fn(self, t_pad, d_pad, d_prev_pad, capacity,
                             crop_points):
        from point_cloud_reid_tpu.tracking.crops import extract_box_crops

        def call(h_buf, xyz_buf, prev_h, prev_xyz, upd_src, upd_dst,
                 slot_idx, seed, pts, boxes):
            h_buf = h_buf.at[upd_dst].set(prev_h[upd_src])
            xyz_buf = xyz_buf.at[upd_dst].set(prev_xyz[upd_src])
            h_t = h_buf[slot_idx]
            crops, _ = extract_box_crops(jax.random.PRNGKey(int(seed)),
                                         jnp.asarray(pts),
                                         jnp.asarray(boxes), crop_points)
            xyz_d, h_d = self.embed(crops)
            d = jnp.linalg.norm(h_t[:, 0, None, :] - h_d[None, :, 0, :],
                                axis=-1)
            return h_buf, xyz_buf, 8.0 - 16.0 * d, h_d, xyz_d
        return call


def _frame_points(rng, centers):
    pts = []
    for c in centers:
        pts.append(rng.normal(scale=0.3, size=(40, 3)) * [1, 1, 0.2] + c)
    return np.concatenate(pts).astype(np.float32)


def test_tracking_end_to_end_identity():
    """Two objects crossing over 6 frames keep their ids; a third appears."""
    rng = np.random.RandomState(5)
    mgr = TrackingManager(_MockScorer(), subsample_number=32,
                          match_threshold=0.9, max_distance=3.0)
    traj_a = [np.array([0.0 + 0.5 * t, 0.0, 0.0]) for t in range(6)]
    traj_b = [np.array([10.0 - 0.5 * t, 1.0, 0.0]) for t in range(6)]

    ids_a, ids_b = [], []
    for t in range(6):
        centers = [traj_a[t], traj_b[t]]
        boxes = np.array([[*traj_a[t], 2, 2, 2, 0.0],
                          [*traj_b[t], 2, 2, 2, 0.0]], np.float32)
        labels = np.array([0, 0])
        if t >= 4:   # new object appears
            c = np.array([20.0, 20.0, 0.0])
            centers.append(c)
            boxes = np.concatenate([boxes, [[*c, 2, 2, 2, 0.0]]]).astype(
                np.float32)
            labels = np.array([0, 0, 1])
        pts = _frame_points(rng, centers)
        tracks = mgr.step(pts, boxes, np.ones(len(boxes), np.float32), labels)
        by_pos = sorted(tracks, key=lambda tr: tr.box[0])
        a = min(tracks, key=lambda tr: np.linalg.norm(tr.box[:3] - traj_a[t]))
        b = min(tracks, key=lambda tr: np.linalg.norm(tr.box[:3] - traj_b[t]))
        ids_a.append(a.track_id)
        ids_b.append(b.track_id)

    assert len(set(ids_a)) == 1, f"track A id switched: {ids_a}"
    assert len(set(ids_b)) == 1, f"track B id switched: {ids_b}"
    assert ids_a[0] != ids_b[0]
    assert len(mgr.store.tracks) == 3


def test_tracking_death():
    mgr = TrackingManager(_MockScorer(), subsample_number=16,
                          match_threshold=0.9, max_age=1)
    rng = np.random.RandomState(6)
    c = np.array([0.0, 0.0, 0.0])
    boxes = np.array([[*c, 2, 2, 2, 0.0]], np.float32)
    mgr.step(_frame_points(rng, [c]), boxes, np.ones(1), np.zeros(1))
    assert len(mgr.store) == 1
    # object disappears; after max_age+1 empty frames the track is pruned
    for _ in range(3):
        mgr.step(np.zeros((0, 3), np.float32), np.zeros((0, 7)),
                 np.zeros(0), np.zeros(0))
    assert len(mgr.store) == 0 and len(mgr.cache) == 0


def test_tracking_manager_with_real_scorer():
    """Smoke: a tiny untrained ReIDNet drives the full device path
    (crops -> embed -> cost matrix) without shape errors."""
    from point_cloud_reid_tpu.inference import PairScorer
    from point_cloud_reid_tpu.models import build_model

    mcfg = dict(
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
    model = build_model(mcfg)
    B, N = 2, 16
    batch = dict(sparse_1=jnp.zeros((B, N, 3)), sparse_2=jnp.zeros((B, N, 3)),
                 id_1=jnp.zeros((B,), jnp.int32), id_2=jnp.zeros((B,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    scorer = PairScorer(model, variables)
    mgr = TrackingManager(scorer, subsample_number=N, match_threshold=1.0,
                          max_distance=5.0)

    rng = np.random.RandomState(7)
    for t in range(2):
        centers = [np.array([0.5 * t, 0, 0]), np.array([5.0, 0, 0])]
        boxes = np.array([[*c, 2, 2, 2, 0.0] for c in centers], np.float32)
        pts = _frame_points(rng, centers)
        tracks = mgr.step(pts, boxes, np.ones(2, np.float32),
                          np.zeros(2, np.int64))
    assert len(tracks) >= 1


def test_lstm_incrementor_and_updater():
    from point_cloud_reid_tpu.tracking.motion import (BoxUpdater,
                                                      LSTMIncrementor,
                                                      constant_velocity_step)

    box = jnp.asarray([1.0, 2.0, 0.0, 2, 2, 2, 0.5])
    out = constant_velocity_step(box, jnp.asarray([0.5, -0.5]), dt=2.0)
    np.testing.assert_allclose(np.asarray(out[:2]), [2.0, 1.0])

    m = LSTMIncrementor(hidden=16)
    seq = jnp.asarray(np.random.RandomState(0).randn(3, 5, 8), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), seq)
    d_full = m.apply(variables, seq)
    assert d_full.shape == (3, 2)
    # variable lengths: prefix of length L must match a truncated sequence
    d_len = m.apply(variables, seq, lengths=jnp.asarray([5, 3, 1]))
    d_trunc = m.apply(variables, seq[1:2, :3])
    np.testing.assert_allclose(np.asarray(d_len[1]), np.asarray(d_trunc[0]),
                               rtol=1e-5, atol=1e-6)

    upd = BoxUpdater(dim_momentum=1.0, yaw_momentum=1.0)
    tb = jnp.asarray([0.0, 0, 0, 2, 2, 2, 0.0])
    db = jnp.asarray([1.0, 1, 0, 4, 4, 4, 1.0])
    nb = np.asarray(upd(tb, db))
    np.testing.assert_allclose(nb[:3], [1, 1, 0])    # center from detection
    np.testing.assert_allclose(nb[3:6], [2, 2, 2])   # dims kept (momentum 1)
    np.testing.assert_allclose(nb[6], 0.0)           # yaw kept


def test_decision_modifier_teacher_forcing():
    from point_cloud_reid_tpu.tracking import DecisionModifier, sampling_rate

    assert sampling_rate("linear_decay", 0, 10) == 1.0
    assert sampling_rate("linear_decay", 10, 10) == 0.0
    assert sampling_rate("always", 5, 10) == 1.0

    dm = DecisionModifier(seed=0)
    dm.set_epoch(0, 10)                        # pure teacher forcing
    out = dm.modify_matches(pred_matches=[(0, 1)], gt_matches=[(0, 0), (1, 1)],
                            num_tracks=2, num_dets=2)
    assert sorted(out) == [(0, 0), (1, 1)]     # gt wins, contradiction dropped

    dm.set_epoch(10, 10)                       # pure model decisions
    out = dm.modify_matches(pred_matches=[(0, 1)], gt_matches=[(0, 0)],
                            num_tracks=1, num_dets=2)
    assert out == [(0, 1)]
    assert dm.modify_newborns([2], [3]) == [2]


def test_image_mode_tracking_with_camera_crops():
    """Image-branch tracking: camera crops -> tiny ViT scorer -> identity kept
    (the ImageReidentifier workload, tracking_point_reid.py:125-203)."""
    from point_cloud_reid_tpu.inference import PairScorer
    from point_cloud_reid_tpu.models import build_model
    from point_cloud_reid_tpu.tracking import crops_per_frame

    mcfg = dict(
        type="ImageReIDNet", backbone="deit-tiny",
        dim=192, downsample_dim=16, image_size=32,
        combine="point-cat", match_type="xcorr_eff", pool_type="both",
        downsample=[dict(type="Linear", out_features=16)],
        cross_lin_attn=dict(type="cross_lin_attn", d_model=16, nhead=2),
        match_head=[dict(type="Linear", out_features=1)],
        output_sequence_size=6,
    )
    model = build_model(mcfg)
    B = 2
    batch = dict(sparse_1=jnp.zeros((B, 3, 32, 32)),
                 sparse_2=jnp.zeros((B, 3, 32, 32)),
                 id_1=jnp.zeros((B,), jnp.int32),
                 id_2=jnp.zeros((B,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    scorer = PairScorer(model, variables, image_mode=True)

    # one synthetic camera looking down +x
    l2c = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0],
                    [0, 0, 0, 1]], np.float32)
    K = np.array([[40, 0, 80], [0, 40, 45], [0, 0, 1]], np.float32)
    images = jnp.asarray(np.random.RandomState(0).rand(1, 3, 90, 160)
                         .astype(np.float32))

    def crop_fn(_frame_data, boxes_p):
        crops, _ = crops_per_frame(
            images, jnp.asarray(l2c[None]), jnp.asarray(K[None]),
            jnp.asarray(boxes_p), image_size=(160, 90), output_size=(32, 32))
        return crops

    mgr = TrackingManager(scorer, match_threshold=1.0, max_distance=5.0,
                          crop_fn=crop_fn)
    for t in range(3):
        boxes = np.array([[10.0 + 0.2 * t, 0, 0, 2, 2, 2, 0.0],
                          [10.0, 3, 0, 2, 2, 2, 0.0]], np.float32)
        tracks = mgr.step(None, boxes, np.ones(2, np.float32),
                          np.zeros(2, np.int64))
    assert len(mgr.store) == 2
    ids = sorted(t.track_id for t in tracks)
    assert ids == [0, 1]            # no identity churn over 3 frames


def test_tracking_eval_accumulator_unit():
    from point_cloud_reid_tpu.evaluation import TrackingEvalAccumulator

    acc = TrackingEvalAccumulator()
    # frame 0: tracks 0,1 born on gt 10,11
    acc.observe_frame([], [(0, 10, 0), (1, 11, 0)], [], [])
    # frame 1: track 0 keeps gt 10 (correct), track 1 jumps to gt 12 (switch)
    acc.observe_frame([(0, 10, 0), (1, 12, 0)], [], [], [])
    # frame 2: track 0 matches an FP det; newborn 2 steals gt 12 while
    # track 1 (which carries it) sits unmatched -> fragmentation
    acc.observe_frame([(0, -1, 0)], [(2, 12, 1)], [1], [])

    class _T:
        def __init__(self, tid, hits):
            self.track_id, self.hits = tid, hits
    acc.end_scene([_T(0, 3), _T(1, 2), _T(2, 1)])

    s = acc.summary()
    a = s["association"]
    assert a["correct"] == 1 and a["id_switches"] == 1
    assert a["fp_matches"] == 1 and a["fragmentations"] == 1
    assert s["track_stats"]["mean_track_length"] == 2.0
    assert s["track_stats"]["median_track_length"] == 2.0
    assert s["track_stats"]["mean_track_length_gt1"] == 2.5
    assert s["track_stats"]["length_frequency"] == {"1": 1, "2": 1, "3": 1}
    assert s["scenes"] == 1 and s["frames"] == 3
    assert s["per_class"]["1"]["fragmentation"] == 1

    # per-rank merge doubles every counter (CustomEval gather parity)
    import copy
    merged = copy.deepcopy(acc).merge(acc)
    s2 = merged.summary()
    assert s2["association"]["correct"] == 2
    assert s2["scenes"] == 2
    import json
    json.dumps(s2)


def test_tracking_eval_end_to_end():
    """TrackingManager + recorder over two scenes of gt-labelled frames
    emits a summary with perfect association on clean synthetic motion."""
    from point_cloud_reid_tpu.evaluation import TrackingEvalAccumulator

    rec = TrackingEvalAccumulator()
    mgr = TrackingManager(_MockScorer(), subsample_number=16,
                          match_threshold=0.7, max_distance=5.0,
                          eval_recorder=rec)
    rng = np.random.RandomState(9)
    for scene in range(2):
        for t in range(4):
            centers = [np.array([0.4 * t, 0, 0]),
                       np.array([8.0, 0.3 * t, 0])]
            boxes = np.array([[*c, 2, 2, 2, 0.0] for c in centers],
                             np.float32)
            mgr.step(_frame_points(rng, centers), boxes,
                     np.ones(2, np.float32), np.zeros(2, np.int64),
                     det_gt_ids=np.array([100, 200]))
        mgr.end_scene()

    s = rec.summary()
    a = s["association"]
    assert s["scenes"] == 2 and s["frames"] == 8
    assert a["id_switches"] == 0 and a["fp_matches"] == 0
    assert a["correct"] == 12            # 3 continuation frames x 2 objs x 2
    assert a["frame_match_acc"] == 1.0
    assert s["track_stats"]["mean_track_length"] == 4.0
    assert s["track_stats"]["mean_tracks_per_scene"] == 2.0


def test_bev_triplet_metric_loss_matches_torch_grouping():
    """bev_triplet_metric_loss == the reference's per-track mean
    TripletMarginLoss summed over tracks (full negative set), computed here
    with torch as the oracle (BEVSupervisor.get_metric_loss semantics,
    tracking_supervision.py:183-270)."""
    torch = pytest.importorskip("torch")
    import numpy as np
    from point_cloud_reid_tpu.tracking.supervision import (
        bev_triplet_metric_loss)

    rs = np.random.RandomState(0)
    M, C, T = 12, 6, 3
    feats = rs.randn(M, C).astype(np.float32)
    ids = rs.randint(0, T, size=M).astype(np.int32)

    crit = torch.nn.TripletMarginLoss(margin=1.0)
    tf = torch.from_numpy(feats)
    expected = 0.0
    for t in range(T):
        a_list, p_list, n_list = [], [], []
        idx = np.where(ids == t)[0]
        neg = np.where(ids != t)[0]
        for anchor in idx:
            for p in idx:
                if p == anchor:
                    continue
                for n in neg:
                    a_list.append(anchor)
                    p_list.append(p)
                    n_list.append(n)
        if not a_list:
            continue
        expected += float(crit(tf[a_list], tf[p_list], tf[n_list]))

    got = float(bev_triplet_metric_loss(jnp.asarray(feats), jnp.asarray(ids),
                                        num_tracks=T))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_bev_memory_end_to_end():
    import numpy as np
    from point_cloud_reid_tpu.tracking.supervision import (
        BEVMemory, sample_bev_features)

    rs = np.random.RandomState(1)
    bev = jnp.asarray(rs.randn(16, 16, 8).astype(np.float32))
    pc_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
    mem = BEVMemory()
    for frame in range(3):
        centers = jnp.asarray(rs.uniform(-40, 40, (5, 2)).astype(np.float32))
        feats = sample_bev_features(bev, centers, pc_range,
                                    rng=jax.random.PRNGKey(frame))
        assert feats.shape == (5, 8)
        mem.append(0, feats, np.array([0, 1, 2, 0, 1]))
        mem.append(1, feats[:2], np.array([7, 7]))
    loss = float(mem.metric_loss())
    assert np.isfinite(loss) and loss >= 0
    mem.reset()
    assert float(mem.metric_loss()) == 0.0


def test_device_cache_matches_host_cache_tracking():
    """The device-resident feature cache must reproduce the host-cache
    tracker's assignments exactly (same model, same scene, same seeds)."""
    from point_cloud_reid_tpu.configs import get_experiment
    from point_cloud_reid_tpu.inference import PairScorer
    from point_cloud_reid_tpu.models import build_model
    import numpy as np

    mcfg = dict(
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
    model = build_model(mcfg)
    N = 16
    batch = dict(sparse_1=jnp.zeros((2, N, 3)), sparse_2=jnp.zeros((2, N, 3)),
                 id_1=jnp.zeros((2,), jnp.int32), id_2=jnp.zeros((2,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    def run(device_cache):
        scorer = PairScorer(model, variables)
        mgr = TrackingManager(scorer, subsample_number=N, match_threshold=1.0,
                              max_distance=5.0, seed=3,
                              device_cache=device_cache)
        rng = np.random.RandomState(11)
        ids_per_frame = []
        for t in range(5):
            # objects far apart: the distance gate makes association
            # unambiguous, so both cache backends must track identically
            # (crop-subsample RNG streams differ between the paths, which
            # can flip near-tied scores in ambiguous scenes)
            centers = [np.array([0.4 * t, 0, 0]), np.array([30.0, 1.0, 0]),
                       np.array([-25.0 + 0.3 * t, -3.0, 0])]
            boxes = np.stack([np.array([*c, 2, 2, 2, 0.0]) for c in centers]
                             ).astype(np.float32)
            pts = np.concatenate([c + rng.randn(40, 3) * 0.3
                                  for c in centers]).astype(np.float32)
            tracks = mgr.step(pts, boxes, np.ones(3, np.float32),
                              np.zeros(3, np.float32))
            ids_per_frame.append(sorted(tr.track_id for tr in tracks))
        return ids_per_frame

    assert run(device_cache=True) == run(device_cache=False)


@pytest.mark.quick
def test_sparse_scoring_matches_dense_tracking():
    """Gated sparse pair-list scoring must reproduce the dense-grid tracker's
    assignments exactly: associate() already masks every ungated cell, so
    scoring only the gate survivors is a pure compute-avoidance rewrite.

    Uses the same unambiguous far-apart scene as the device-cache parity
    test; sparse_scoring='always' drives every scored frame through
    make_cached_pair_frame_fn (XLA fallback on CPU), 'never' keeps the
    full-grid path. Both run the device cache with the same seed, so the
    crop-subsample RNG streams are identical."""
    from point_cloud_reid_tpu.inference import PairScorer
    from point_cloud_reid_tpu.models import build_model
    import numpy as np

    mcfg = dict(
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
    model = build_model(mcfg)
    N = 16
    batch = dict(sparse_1=jnp.zeros((2, N, 3)), sparse_2=jnp.zeros((2, N, 3)),
                 id_1=jnp.zeros((2,), jnp.int32), id_2=jnp.zeros((2,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    def run(sparse):
        scorer = PairScorer(model, variables)
        mgr = TrackingManager(scorer, subsample_number=N, match_threshold=1.0,
                              max_distance=5.0, seed=3, device_cache=True,
                              sparse_scoring=sparse)
        rng = np.random.RandomState(11)
        ids_per_frame = []
        for t in range(5):
            centers = [np.array([0.4 * t, 0, 0]), np.array([30.0, 1.0, 0]),
                       np.array([-25.0 + 0.3 * t, -3.0, 0])]
            boxes = np.stack([np.array([*c, 2, 2, 2, 0.0]) for c in centers]
                             ).astype(np.float32)
            pts = np.concatenate([c + rng.randn(40, 3) * 0.3
                                  for c in centers]).astype(np.float32)
            tracks = mgr.step(pts, boxes, np.ones(3, np.float32),
                              np.zeros(3, np.float32))
            ids_per_frame.append(sorted(tr.track_id for tr in tracks))
        # 'always' must actually have exercised the sparse path
        if sparse == "always":
            assert mgr._cached_pair_frame_fns, "sparse path never dispatched"
        else:
            assert not mgr._cached_pair_frame_fns
        return ids_per_frame

    assert run("always") == run("never")


@pytest.mark.quick
def test_sparse_scoring_zero_candidates_frame():
    """A frame whose gate admits NO pairs must still embed the detections
    and update the device cache through the sparse program (padded dummy
    pairs score garbage that is discarded): every track misses, every det
    births a new track, and tracking continues correctly afterwards."""
    from point_cloud_reid_tpu.inference import PairScorer
    from point_cloud_reid_tpu.models import build_model
    import numpy as np

    mcfg = dict(
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
    model = build_model(mcfg)
    N = 16
    batch = dict(sparse_1=jnp.zeros((2, N, 3)), sparse_2=jnp.zeros((2, N, 3)),
                 id_1=jnp.zeros((2,), jnp.int32), id_2=jnp.zeros((2,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    scorer = PairScorer(model, variables)
    mgr = TrackingManager(scorer, subsample_number=N, match_threshold=1.0,
                          max_distance=2.0, device_cache=True,
                          sparse_scoring="always")
    rng = np.random.RandomState(4)

    def frame(centers):
        boxes = np.stack([np.array([*c, 2, 2, 2, 0.0]) for c in centers]
                         ).astype(np.float32)
        pts = np.concatenate([c + rng.randn(30, 3) * 0.3 for c in centers]
                             ).astype(np.float32)
        return pts, boxes

    c0 = [np.array([0.0, 0, 0]), np.array([20.0, 0, 0])]
    pts, boxes = frame(c0)
    mgr.step(pts, boxes, np.ones(2, np.float32), np.zeros(2, np.float32))
    # frame 2: detections 10 m from every track -> zero gate survivors
    c1 = [np.array([10.0, 0, 0]), np.array([30.0, 0, 0])]
    pts, boxes = frame(c1)
    tracks = mgr.step(pts, boxes, np.ones(2, np.float32),
                      np.zeros(2, np.float32))
    assert len(mgr.store.tracks) == 4          # 2 missed + 2 newborn
    assert mgr._cached_pair_frame_fns          # sparse program dispatched
    # frame 3: dets back on the frame-2 positions -> normal association
    pts, boxes = frame(c1)
    tracks = mgr.step(pts, boxes, np.ones(2, np.float32),
                      np.zeros(2, np.float32))
    assert len(tracks) >= 2


def _tiny_image_setup():
    """Tiny ImageReIDNet + one synthetic camera looking down +x (shared by
    the image-branch deployment-path tests)."""
    from point_cloud_reid_tpu.inference import PairScorer
    from point_cloud_reid_tpu.models import build_model

    mcfg = dict(
        type="ImageReIDNet", backbone="deit-tiny",
        dim=192, downsample_dim=16, image_size=32,
        combine="point-cat", match_type="xcorr_eff", pool_type="both",
        downsample=[dict(type="Linear", out_features=16)],
        cross_lin_attn=dict(type="cross_lin_attn", d_model=16, nhead=2),
        match_head=[dict(type="Linear", out_features=1)],
        output_sequence_size=6,
    )
    model = build_model(mcfg)
    B = 2
    batch = dict(sparse_1=jnp.zeros((B, 3, 32, 32)),
                 sparse_2=jnp.zeros((B, 3, 32, 32)),
                 id_1=jnp.zeros((B,), jnp.int32),
                 id_2=jnp.zeros((B,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    l2c = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0],
                    [0, 0, 0, 1]], np.float32)[None]
    K = np.array([[40, 0, 80], [0, 40, 45], [0, 0, 1]], np.float32)[None]
    images = np.random.RandomState(0).rand(1, 3, 90, 160).astype(np.float32)
    return model, variables, (images, l2c, K)


def _image_frames(n_frames=4, n_obj=3):
    """Deterministic well-separated moving boxes in front of the camera."""
    frames = []
    for t in range(n_frames):
        boxes = np.array(
            [[10.0 + 0.2 * t, -4.0 + 4.0 * i, 0, 2, 2, 2, 0.0]
             for i in range(n_obj)], np.float32)
        frames.append(boxes)
    return frames


def test_image_fused_device_cache_matches_host_path():
    """The image-branch DEPLOYMENT path (no crop_fn: DeviceTrackCache +
    fused crop-project + ViT embed + grid scoring, one program per frame)
    must reproduce the legacy host-cache path's cost matrices and
    assignments — it is the same math with the ~8 MB/frame feature
    round-trip eliminated (ImageReidentifier workload,
    tracking_point_reid.py:125-203)."""
    import point_cloud_reid_tpu.tracking.manager as manager_mod
    from point_cloud_reid_tpu.inference import PairScorer

    model, variables, (images, l2c, K) = _tiny_image_setup()

    def run(fused):
        scorer = PairScorer(model, variables, image_mode=True)
        if fused:
            mgr = TrackingManager(scorer, match_threshold=1.0,
                                  max_distance=5.0, sparse_scoring="never")
        else:
            def crop_fn(_frame, boxes_p):
                from point_cloud_reid_tpu.tracking import crops_per_frame
                crops, _ = crops_per_frame(
                    jnp.asarray(images), jnp.asarray(l2c), jnp.asarray(K),
                    jnp.asarray(boxes_p), image_size=(160, 90),
                    output_size=(32, 32))
                return crops
            mgr = TrackingManager(scorer, match_threshold=1.0,
                                  max_distance=5.0, crop_fn=crop_fn)
        costs, ids = [], []
        orig = manager_mod.associate

        def recording(cost, **kw):
            costs.append(np.asarray(cost))
            return orig(cost, **kw)

        manager_mod.associate = recording
        try:
            for boxes in _image_frames():
                tracks = mgr.step((images, l2c, K) if fused else None,
                                  boxes, np.ones(len(boxes), np.float32),
                                  np.zeros(len(boxes), np.int64))
                ids.append(sorted(t.track_id for t in tracks))
        finally:
            manager_mod.associate = orig
        return costs, ids, mgr

    costs_f, ids_f, mgr_f = run(fused=True)
    costs_h, ids_h, _ = run(fused=False)
    assert mgr_f._dc.h_buf is not None          # device cache actually used
    assert any(k[0] == "img" for k in mgr_f._cached_frame_fns)
    assert ids_f == ids_h
    assert len(costs_f) == len(costs_h) == 3    # frames 1..3 have tracks
    for cf, ch in zip(costs_f, costs_h):
        np.testing.assert_allclose(cf, ch, rtol=1e-4, atol=1e-5)


def test_image_fused_sparse_matches_dense():
    """Image-branch gated sparse pair-list scoring == the dense image grid's
    assignments (the image analog of
    test_sparse_scoring_matches_dense_tracking)."""
    from point_cloud_reid_tpu.inference import PairScorer

    model, variables, frame = _tiny_image_setup()

    def run(sparse):
        scorer = PairScorer(model, variables, image_mode=True)
        mgr = TrackingManager(scorer, match_threshold=1.0, max_distance=5.0,
                              sparse_scoring=sparse)
        ids = []
        for boxes in _image_frames():
            tracks = mgr.step(frame, boxes, np.ones(len(boxes), np.float32),
                              np.zeros(len(boxes), np.int64))
            ids.append(sorted(t.track_id for t in tracks))
        if sparse == "always":
            assert mgr._cached_pair_frame_fns, "sparse path never dispatched"
        else:
            assert not mgr._cached_pair_frame_fns
        return ids

    assert run("always") == run("never")


@pytest.mark.quick
def test_device_cache_grow_preserves_slots():
    """DeviceTrackCache.grow doubles capacity in place: live slots keep
    their indices AND their feature rows; the scratch row moves to the new
    last index; assign past capacity grows instead of raising."""
    from point_cloud_reid_tpu.inference.pair_scoring import DeviceTrackCache

    dc = DeviceTrackCache(capacity=2)
    dc.ensure(4, 8, jnp.float32)
    dc.h_buf = dc.h_buf.at[0].set(1.0)
    dc.h_buf = dc.h_buf.at[1].set(2.0)
    s0, s1 = dc.assign(100), dc.assign(101)
    assert {s0, s1} == {0, 1} and not dc._free
    s2 = dc.assign(102)                       # grows, no RuntimeError
    assert dc.capacity == 4
    assert dc.h_buf.shape == (5, 4, 8) and dc.xyz_buf.shape == (5, 4, 3)
    assert dc.slot(100) == s0 and dc.slot(101) == s1
    assert s2 in (2, 3)
    got = np.asarray(dc.h_buf)
    assert np.all(got[s0] == (1.0 if s0 == 0 else 2.0))
    assert np.all(got[2:] == 0.0)             # new rows + scratch zeroed
    dc.drop([100])
    assert len(dc) == 2 and s0 in dc._free


@pytest.mark.quick
def test_device_cache_growth_bounded():
    """grow() refuses past _MAX_GROWTH x the constructed capacity with the
    actionable slot-leak message — a leaking caller gets the loud error
    back instead of doubling device buffers into an allocator OOM."""
    from point_cloud_reid_tpu.inference.pair_scoring import DeviceTrackCache

    dc = DeviceTrackCache(capacity=2)
    dc.ensure(4, 8, jnp.float32)
    for tid in range(2 * DeviceTrackCache._MAX_GROWTH):  # leak: never drop()
        dc.assign(tid)
    assert dc.capacity == 2 * DeviceTrackCache._MAX_GROWTH
    with pytest.raises(RuntimeError, match="slot leak"):
        dc.assign(999)


def test_device_cache_growth_churn_soak():
    """Multi-scene churn at a deliberately tiny cache: hundreds of frames of
    track birth/death grow the cache instead of dying mid-scene
    (VERDICT r4 weak item 4), with zero slot leaks (slots + free list always
    partition the capacity)."""
    rng = np.random.RandomState(7)
    mgr = TrackingManager(_MockCachedScorer(), subsample_number=16,
                          match_threshold=0.9, max_distance=3.0,
                          cache_capacity=4, max_age=1)
    for scene in range(3):
        for t in range(100):
            # drifting population: up to 12 objects, ids churn every frame
            n = 4 + (t % 9)
            centers = np.stack([np.array([6.0 * i + 0.1 * t, scene, 0.0])
                                for i in range(n)])
            boxes = np.concatenate(
                [centers, np.full((n, 3), 2.0, np.float32),
                 np.zeros((n, 1), np.float32)], axis=1).astype(np.float32)
            pts = np.repeat(centers, 20, axis=0).astype(np.float32)
            pts += rng.randn(*pts.shape).astype(np.float32) * 0.2
            mgr.step(pts, boxes, np.ones(n, np.float32),
                     np.zeros(n, np.int64))
            dc = mgr._dc
            used = sorted(dc._slots.values())
            assert len(set(used)) == len(used)              # no double-book
            assert len(used) + len(dc._free) == dc.capacity  # no slot leak
            assert all(s < dc.capacity for s in used)
        mgr.end_scene()
    assert mgr._dc.capacity >= 8               # growth actually happened


def test_sparse_auto_dense_fallback_crowded(monkeypatch):
    """A crowded scene where the class+BEV gate passes >25% of the padded
    grid must fall back to the dense grid kernel under 'auto' (the pair
    list double-pays per-pair factor traffic at dense gates) AND produce
    the same assignments as sparse_scoring='never'."""
    from point_cloud_reid_tpu.inference import PairScorer
    from point_cloud_reid_tpu.models import build_model

    mcfg = dict(
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
    model = build_model(mcfg)
    N = 16
    batch = dict(sparse_1=jnp.zeros((2, N, 3)), sparse_2=jnp.zeros((2, N, 3)),
                 id_1=jnp.zeros((2,), jnp.int32),
                 id_2=jnp.zeros((2,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    # force 'auto' on at any grid size so the tiny scene exercises the policy
    monkeypatch.setattr(TrackingManager, "_SPARSE_MIN_GRID", 1)

    def run(sparse):
        scorer = PairScorer(model, variables)
        mgr = TrackingManager(scorer, subsample_number=N, match_threshold=1.0,
                              max_distance=50.0, seed=3, device_cache=True,
                              sparse_scoring=sparse)
        rng = np.random.RandomState(11)
        ids_per_frame = []
        for t in range(4):
            # 5 same-class objects all within the (huge) gate: 25 gated
            # pairs on an 8x8 padded grid -> 4*25 > 64 -> dense fallback
            centers = [np.array([6.0 * i + 0.3 * t, float(i % 2), 0])
                       for i in range(5)]
            boxes = np.stack([np.array([*c, 2, 2, 2, 0.0]) for c in centers]
                             ).astype(np.float32)
            pts = np.concatenate([c + rng.randn(40, 3) * 0.3
                                  for c in centers]).astype(np.float32)
            tracks = mgr.step(pts, boxes, np.ones(5, np.float32),
                              np.zeros(5, np.float32))
            ids_per_frame.append(sorted(tr.track_id for tr in tracks))
        return ids_per_frame, mgr

    ids_auto, mgr_auto = run("auto")
    ids_never, _ = run("never")
    assert ids_auto == ids_never
    # the fallback fired: every scored frame used the dense grid program
    assert not mgr_auto._cached_pair_frame_fns
    assert mgr_auto._cached_frame_fns


@pytest.mark.quick
def test_p_pad_hysteresis_bounded_compiles():
    """The sticky p_pad bucket must absorb pair-count fluctuation around a
    bucket edge (each new p_pad is a fresh compile): oscillating P in
    [28, 36] settles on ONE bucket, and the bucket only shrinks once the
    pair count drops to a quarter of it."""
    mgr = TrackingManager(_MockScorer(), subsample_number=16)
    pads = set()
    for t in range(20):
        P = 28 + (t * 5) % 9                     # oscillates 28..36
        pairs = np.zeros((P, 2), np.int32)
        _, _, p_pad = mgr._pad_pairs(pairs)
        pads.add(p_pad)
    assert pads == {32, 64}                      # 28->32 once, then sticky 64
    _, _, p_pad = mgr._pad_pairs(np.zeros((33, 2), np.int32))
    assert p_pad == 64                           # sticky across the edge
    _, _, p_pad = mgr._pad_pairs(np.zeros((17, 2), np.int32))
    assert p_pad == 64                           # 4*17 > 64: still sticky
    _, _, p_pad = mgr._pad_pairs(np.zeros((8, 2), np.int32))
    assert p_pad == 16                           # 4*8 <= 64: shrink allowed


@pytest.mark.quick
def test_sparse_min_grid_boundary():
    """'auto' flips to sparse strictly ABOVE _SPARSE_MIN_GRID padded pairs
    (at/below it the dense kernel wins; p_pad bucket churn would cost more
    compiles than the pair kernel saves)."""
    mgr = TrackingManager(_MockScorer(), sparse_scoring="auto")
    assert mgr._SPARSE_MIN_GRID == 4096
    assert not mgr._sparse_on(32, 128)           # 32*128 == 4096: dense
    assert mgr._sparse_on(33, 128)               # rounds to 64*128: sparse
    assert mgr._sparse_on(32, 256)               # 8192: sparse
    assert not mgr._sparse_on(1, 128)            # 8*128: dense
    mgr_always = TrackingManager(_MockScorer(), sparse_scoring="always")
    assert mgr_always._sparse_on(1, 8)
    mgr_never = TrackingManager(_MockScorer(), sparse_scoring="never")
    assert not mgr_never._sparse_on(512, 512)


def test_track_cli(tmp_path):
    """tools/track.py drives the tracking layer end-to-end from the command
    line: scene .npz in -> per-frame tracks.jsonl + the tracking-eval
    summary (tools/tracking_plots.py input) out, with stable ids across
    frames (the reference's tracker-through-test-pipeline surface,
    trackers/deprecated/tracking_manager.py + core/hooks/utils.py)."""
    import json
    import os
    import subprocess
    import sys

    rs = np.random.RandomState(0)
    scene = {}
    for t in range(3):
        c = np.array([[0.3 * t, 0, 0], [8.0, 0.2 * t, 0]], np.float32)
        scene[f"boxes_{t}"] = np.concatenate(
            [c, np.full((2, 3), 2, np.float32), np.zeros((2, 1), np.float32)],
            axis=1)
        scene[f"scores_{t}"] = np.ones(2, np.float32)
        scene[f"labels_{t}"] = np.zeros(2, np.int64)
        scene[f"gt_ids_{t}"] = np.arange(2)
        scene[f"points_{t}"] = (np.repeat(c, 50, 0)
                                + rs.randn(100, 3).astype(np.float32) * 0.2)
    np.savez(tmp_path / "scene0.npz", **scene)

    work = tmp_path / "out"
    proc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools", "track.py"),
         "pts_pointnet_point-cat_nus_det_4x256_500e",
         "--scene-dir", str(tmp_path), "--subsample", "16",
         "--work-dir", str(work)],
        capture_output=True, text=True, timeout=540,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS=""))
    assert proc.returncode == 0, proc.stderr[-2000:]

    headline = json.loads(proc.stdout.strip().splitlines()[-1])
    assert headline["frames"] == 3 and not headline["image_mode"]

    frames = [json.loads(l) for l in open(work / "tracks.jsonl")]
    assert len(frames) == 3
    ids = [sorted(tr["id"] for tr in f["tracks"]) for f in frames]
    assert all(len(i) == 2 for i in ids)
    assert ids[0] == ids[1] == ids[2]            # two stable tracks

    summary = json.load(open(work / "tracking_summary.json"))
    assert summary["frames"] == 3 and summary["scenes"] == 1
    assert summary["association"]["correct"] == 4     # 2 objs x frames 2,3
    assert summary["association"]["id_switches"] == 0


@pytest.mark.quick
def test_sweep_pad_ladder_rungs():
    """The headline tracker workloads must land on tight sweep buckets:
    96 obj x 600 pts -> 65,536 (was 131,072) and Waymo-dense 256 x 600 ->
    196,608 (was 262,144) — the crop stage is linear in the padded rows, so
    a ladder regression silently costs device time at the bench shapes."""
    from point_cloud_reid_tpu.inference.pair_scoring import _round_up
    from point_cloud_reid_tpu.tracking.manager import SWEEP_SIZES

    assert _round_up(96 * 600, sizes=SWEEP_SIZES) == 65536
    assert _round_up(256 * 600, sizes=SWEEP_SIZES) == 196608
    assert _round_up(2048, sizes=SWEEP_SIZES) == 2048
    assert _round_up(524289, sizes=SWEEP_SIZES) == 2 ** 20  # pow2 overflow
