"""Metrics-engine tests (MatchingEval / evaluate_results)."""
import pytest
import numpy as np

from point_cloud_reid_tpu.evaluation import (MatchingEval, evaluate_results,
                                             f1_precision_recall)

pytestmark = pytest.mark.quick


def logits_of(p01):
    """Map hard predictions {0,1} to logits of the right sign."""
    return np.where(np.asarray(p01) > 0.5, 4.0, -4.0)


def test_f1_precision_recall_perfect():
    preds = np.array([1, 1, 0, 0], dtype=np.float64)
    targets = preds.copy()
    m = f1_precision_recall(preds, targets)
    assert abs(m["val_match_recall_pos"] - 1.0) < 1e-3
    assert abs(m["val_match_precision_pos"] - 1.0) < 1e-3
    assert abs(m["val_match_f1_pos"] - 1.0) < 1e-2


def test_f1_precision_recall_mixed():
    preds = np.array([1, 0, 1, 0], dtype=np.float64)
    targets = np.array([1, 1, 0, 0], dtype=np.float64)
    m = f1_precision_recall(preds, targets)
    assert abs(m["val_match_recall_pos"] - 0.5) < 1e-3
    assert abs(m["val_match_precision_pos"] - 0.5) < 1e-3


def test_evaluate_points_buckets():
    me = MatchingEval()
    n = 64
    rng = np.random.RandomState(0)
    targets = rng.randint(0, 2, n).astype(np.float64)
    logits = logits_of(targets)  # perfect predictions
    num_points = rng.randint(1, 512, size=(n, 2))
    out = me.evaluate_points(logits, targets, num_points)
    assert set(out) == {"at_least_one", "at_least_both", "for_a_pair"}
    first = out["at_least_one"]["(0, 1)"]
    assert first["accuracy"] == 1.0
    assert first["num_observations_pos"] + first["num_observations_neg"] == n


def test_eval_per_visibility_excludes_fp():
    me = MatchingEval()
    targets = np.array([1.0, 0.0, -1.0, 1.0])
    logits = logits_of([1, 0, 1, 1])
    vis = np.array([[3, 3], [2, 1], [0, 0], [1, 2]])
    out = me.eval_per_visibility(logits, targets, vis)
    top = out["at_least_both"]["0"]
    assert top["num_observations_pos"] == 2  # the -1 row is dropped
    assert top["accuracy"] == 1.0


def test_evaluate_results_end_to_end():
    rng = np.random.RandomState(1)
    n = 128
    gt = rng.randint(0, 2, n).astype(np.float64)
    results = dict(
        val_match_preds=logits_of(gt),
        val_match_gt=gt,
        match_classes=rng.randint(0, 10, size=(n, 2)),
        num_points=rng.randint(1, 256, size=(n, 2)),
        val_vis_gt_all=rng.randint(0, 4, size=(n, 2)),
        val_cls_preds=np.eye(10)[rng.randint(0, 10, n)],
        val_cls_gt=rng.randint(0, 10, n),
        val_match_loss=np.array([0.5]),
    )
    results["val_cls_gt"] = results["val_cls_preds"].argmax(1)  # perfect cls
    out = evaluate_results(results, cls_to_idx={f"class_{i}": i for i in
                                                range(10)}, num_classes=10)
    assert out["val_match_acc"] == 1.0
    assert out["val_cls_acc"] == 1.0
    assert out["val_match_loss"] == 0.5
    assert "results_per_points" in out["stratified"]
    import json
    json.dumps(out)  # must be JSON-serializable


def test_evaluate_results_uses_real_distances():
    """results_per_distance comes from the distances array when present
    (and only falls back to the visibility-slot quirk without it)."""
    rng = np.random.RandomState(2)
    n = 64
    gt = rng.randint(0, 2, n).astype(np.float64)
    base = dict(
        val_match_preds=logits_of(gt), val_match_gt=gt,
        match_classes=rng.randint(0, 10, size=(n, 2)),
        num_points=rng.randint(1, 256, size=(n, 2)),
        val_vis_gt_all=rng.randint(0, 4, size=(n, 2)),
    )
    dists = rng.rand(n, 2).astype(np.float32) * 60.0
    out = evaluate_results(dict(base, distances=dists),
                           cls_to_idx={f"class_{i}": i for i in range(10)},
                           num_classes=10)
    table = out["stratified"]["results_per_distance"]["at_least_one"]
    # 5m bins over a 60m range -> far more rows than the 4 visibility levels
    assert len(table) >= 12

    out2 = evaluate_results(base, cls_to_idx={f"class_{i}": i
                                              for i in range(10)},
                            num_classes=10)
    table2 = out2["stratified"]["results_per_distance"]["at_least_one"]
    assert len(table2) < len(table)   # visibility-quirk fallback shape
