"""Plot tool: multi-run overlays, pair-bucket heatmap + curve families
render from real evaluate_results output (acc_plots_tool.py parity)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytest.importorskip("matplotlib")

from point_cloud_reid_tpu.evaluation import evaluate_results

pytestmark = pytest.mark.quick


def _report(seed):
    rng = np.random.RandomState(seed)
    n = 256
    gt = rng.randint(0, 2, n).astype(np.float64)
    logits = np.where(gt > 0, 3.0, -3.0) + rng.randn(n) * 2
    results = dict(
        val_match_preds=logits, val_match_gt=gt,
        match_classes=rng.randint(0, 4, size=(n, 2)),
        num_points=rng.randint(1, 512, size=(n, 2)),
        val_vis_gt_all=rng.randint(0, 4, size=(n, 2)),
        distances=rng.rand(n, 2) * 55.0,
    )
    return evaluate_results(results,
                            cls_to_idx={f"class_{i}": i for i in range(4)},
                            num_classes=4)


def test_acc_plots_multi_run_and_heatmaps(tmp_path):
    paths = []
    for s in (0, 1):
        p = tmp_path / f"run{s}.json"
        with open(p, "w") as f:
            json.dump(_report(s), f)
        paths.append(str(p))

    out = tmp_path / "plots"
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "acc_plots.py"),
         *paths, "--labels", "A", "B", "--out", str(out),
         "--metrics", "acc", "f1", "--pair-buckets"],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    written = json.loads(proc.stdout)["plots"]
    names = {os.path.basename(p) for p in written}
    # 1-D curves for all three stratifications, both modes
    for strat in ("results_per_points", "results_per_visibility",
                  "results_per_distance"):
        assert f"{strat}_at_least_one.png" in names
        assert f"{strat}_at_least_both.png" in names
    # pair-bucket heatmap + per-bucket curve family
    assert "results_per_points_pair_heatmap.png" in names
    assert any(n.startswith("results_per_points_pair_bucket_")
               for n in names)
    # per-class curves
    assert any(n.startswith("points_class_") for n in names)
    for p in written:
        assert os.path.getsize(p) > 1000


def test_tracking_plots_tool(tmp_path):
    """tools/tracking_plots.py draws the reference's mistake-analysis figure
    families (pies, track-length frequency, decision bars;
    core/hooks/utils.py:306-474) from a TrackingEvalAccumulator summary."""
    from point_cloud_reid_tpu.evaluation.tracking_summary import (
        TrackingEvalAccumulator)

    acc = TrackingEvalAccumulator()
    acc.observe_frame([(1, 10, 0), (2, 11, 0), (3, -1, 1)], [(4, 12, 1)],
                      [], [])
    acc.observe_frame([(1, 10, 0), (2, 13, 0)], [], [3, 4], [])

    class _T:
        def __init__(self, tid, hits):
            self.track_id, self.hits = tid, hits

    acc.end_scene([_T(1, 2), _T(2, 2), _T(3, 1), _T(4, 1)])
    path = tmp_path / "summary.json"
    with open(path, "w") as f:
        json.dump(acc.summary(), f)

    out = tmp_path / "plots"
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "tracking_plots.py"),
         str(path), "--out", str(out)],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    written = {os.path.basename(p)
               for p in json.loads(proc.stdout)["plots"]}
    assert "mistake_share.png" in written
    assert "track_length_frequency.png" in written
    assert "decision_metrics.png" in written
    assert any(n.startswith("mistake_share_") for n in written)
