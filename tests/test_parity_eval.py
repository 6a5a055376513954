"""Turnkey parity harness dry run: torch replica .pth -> accuracy report.

Exercises tools/parity_eval.py end-to-end TODAY (zero-egress environment):
a torch flagship-replica checkpoint (reference state-dict names by
construction) + a synthetic store stand in for the released .pth + imported
dataset. The harness chains converter -> store -> seeded/frozen val pairs ->
stratified eval -> accuracy-delta verdict, replicating the reference protocol
(launcher_testing.py:14-53, testing_base.py:8-18) as one command.
"""
import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from point_cloud_reid_tpu.configs import experiments as E  # noqa: E402
from point_cloud_reid_tpu.configs import datasets as D  # noqa: E402
from tests.test_convert_full_model import TorchReIDNet  # noqa: E402

CONV_OUT, NSAMPLE, BLIST = 16, (8, 8, 8), [16, 8, 4]


def _tiny_testing_experiment(**kw):
    """A testing_* leaf at torch-replica width (flagship structure)."""
    mcfg = dict(
        type="ReIDNet",
        backbone=dict(type="Pointnet_Backbone", input_channels=0,
                      use_xyz=True, conv_out=CONV_OUT, mul=1,
                      nsample=list(NSAMPLE)),
        match_head=[dict(type="LinearRes", n_in=2 * CONV_OUT,
                         n_out=2 * CONV_OUT, norm="GN", ng=8),
                    dict(type="Linear", out_features=1)],
        cross_stage1=dict(type="corss_attention", d_model=CONV_OUT, nhead=2,
                          attention="linear"),
        cross_stage2=dict(type="corss_attention", d_model=CONV_OUT, nhead=2,
                          attention="linear"),
        match_type="xcorr_eff", pool_type="both", combine="point-cat",
        backbone_list=BLIST, output_sequence_size=CONV_OUT,
        hidden_size=2 * CONV_OUT,
    )
    cfg = E.compose(D.nuscenes_pts(subsample_sparse=32, **kw), mcfg,
                    E.schedule("cyclic_500e_lr3e-4"))
    cfg["runtime"] = dict(cfg["runtime"], validate=True, deterministic=True,
                          eval_only=True)
    return cfg


@pytest.fixture
def registered_tiny(monkeypatch):
    monkeypatch.setitem(E.EXPERIMENTS, "testing_tiny_parity",
                        _tiny_testing_experiment)
    return "testing_tiny_parity"


def test_parity_eval_end_to_end(registered_tiny, tmp_path, capsys):
    import parity_eval

    torch.manual_seed(3)
    tmod = TorchReIDNet(conv_out=CONV_OUT).eval()
    pth = str(tmp_path / "replica.pth")
    torch.save(tmod.state_dict(), pth)

    wd = str(tmp_path / "wd")
    parity_eval.main([registered_tiny, "--pth", pth, "--work-dir", wd,
                      "--synthetic-objects", "24", "--batch-size", "16"])
    out = json.loads(capsys.readouterr().out)
    acc = out["val_match_acc_pct"]
    assert 0.0 <= acc <= 100.0
    report = json.load(open(os.path.join(wd, "parity_report.json")))
    assert report["val_match_acc_pct"] == acc

    # parity gate: passes at the measured value, fails 5 points away
    parity_eval.main([registered_tiny, "--pth", pth,
                      "--synthetic-objects", "24", "--batch-size", "16",
                      "--expected-acc", str(acc)])
    out2 = json.loads(capsys.readouterr().out)
    assert out2["parity"] is True
    assert abs(out2["val_match_acc_pct"] - acc) < 1e-9  # deterministic replay

    with pytest.raises(SystemExit):
        parity_eval.main([registered_tiny, "--pth", pth,
                          "--synthetic-objects", "24", "--batch-size", "16",
                          "--expected-acc", str(acc + 5.0)])
    out3 = json.loads(capsys.readouterr().out)
    assert out3["parity"] is False


def test_parity_eval_frozen_pairs_replay(registered_tiny, tmp_path, capsys):
    """--pairs replays a frozen artifact (the cross-framework protocol) and
    reproduces the seeded construction's accuracy exactly."""
    import parity_eval
    from point_cloud_reid_tpu.data import SyntheticStore, build_pair_dataset

    torch.manual_seed(4)
    tmod = TorchReIDNet(conv_out=CONV_OUT).eval()
    pth = str(tmp_path / "replica.pth")
    torch.save(tmod.state_dict(), pth)

    # baseline: seeded construction
    parity_eval.main([registered_tiny, "--pth", pth,
                      "--synthetic-objects", "24", "--batch-size", "16"])
    base = json.loads(capsys.readouterr().out)

    # freeze the same val pairs the harness builds internally
    cfg = _tiny_testing_experiment()
    store = SyntheticStore(num_objects=24,
                           class_names=list(cfg["dataset"]["train"]["classes"]))
    val = build_pair_dataset(cfg["dataset"]["val"], store, store)
    pairs_path = str(tmp_path / "pairs.json")
    with open(pairs_path, "w") as f:
        json.dump(val.dump_pairs(), f)

    parity_eval.main([registered_tiny, "--pth", pth, "--pairs", pairs_path,
                      "--synthetic-objects", "24", "--batch-size", "16"])
    replay = json.loads(capsys.readouterr().out)
    assert replay["val_match_acc_pct"] == base["val_match_acc_pct"]
