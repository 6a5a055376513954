"""Monitor + profiling coverage: the UpdateParam/GradMonitor equivalent
(make_train_step(monitor=True), core/hooks/update_monitors_hook.py:5-63) and
the tracing utilities that replace the reference's verbose wall-clock prints
(ReIDNet.py:722-736; SURVEY.md §5.1)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from point_cloud_reid_tpu.configs import get_experiment
from point_cloud_reid_tpu.models import build_model
from point_cloud_reid_tpu.train import TrainState, build_optimizer, \
    make_train_step
from point_cloud_reid_tpu.train.schedules import ScheduleConfig
from point_cloud_reid_tpu.utils.profiling import StepTimer, trace_context


def _tiny_batch(B=4, N=16):
    rng = jax.random.PRNGKey(0)
    return dict(
        sparse_1=jax.random.normal(rng, (B, N, 3)),
        sparse_2=jax.random.normal(jax.random.PRNGKey(1), (B, N, 3)),
        label_1=jnp.zeros((B,), jnp.int32),
        label_2=(jnp.arange(B, dtype=jnp.int32) % 2),
        id_1=jnp.arange(B, dtype=jnp.int32),
        id_2=jnp.arange(B, dtype=jnp.int32) % 3,
    )


def test_train_step_monitor_norms():
    cfg = get_experiment("pts_point-transformer_point-cat_nus_det_4x256_500e")
    mcfg = dict(cfg["model"])
    mcfg["backbone"] = dict(mcfg["backbone"], mul=1)
    mcfg["backbone_list"] = [8, 4, 2]
    model = build_model(mcfg)
    batch = _tiny_batch()
    tx = build_optimizer(ScheduleConfig(max_epochs=1), steps_per_epoch=2)
    state = TrainState.create(model, tx, batch, rng=jax.random.PRNGKey(2))

    step = make_train_step(model, tx, losses_to_use=dict(match=True),
                           alpha={}, donate=False, monitor=True)
    _, log = step(state, batch, jax.random.PRNGKey(3))
    for k in ("grad_norm", "param_norm", "update_norm"):
        v = float(log[k])
        assert np.isfinite(v) and v > 0, (k, v)

    # monitor off -> the extra norms are not computed
    plain = make_train_step(model, tx, losses_to_use=dict(match=True),
                            alpha={}, donate=False)
    _, log2 = plain(state, batch, jax.random.PRNGKey(3))
    assert "param_norm" not in log2 and "update_norm" not in log2
    assert "grad_norm" in log2


def test_step_timer_stats():
    t = StepTimer()
    for _ in range(5):
        t.start()
        x = jnp.ones((8, 8)) * 2.0
        t.stop(x)
    assert len(t.times) == 5
    assert t.mean > 0
    assert t.percentile(50) <= t.percentile(100)
    assert t.percentile(0) <= t.mean * 5


def test_trace_context(tmp_path):
    with trace_context(None):     # no-op path
        pass
    log_dir = str(tmp_path / "trace")
    with trace_context(log_dir):
        jnp.dot(jnp.ones((16, 16)), jnp.ones((16, 16))).block_until_ready()
    # a profile dump was written under the log dir
    found = [f for _, _, files in os.walk(log_dir) for f in files]
    assert found, "trace_context produced no profile artifacts"


def test_launcher_dry_run_and_job_file(tmp_path, capsys):
    """tools/launcher.py (launcher_training.py equivalent): job-file parsing,
    dry-run command construction, result JSON."""
    import json
    import sys
    sys.path.insert(0, "tools")
    import importlib
    launcher = importlib.import_module("launcher")

    jobs = [{"experiment": "pts_pointnet_point-cat_nus_det_4x256_500e",
             "args": ["--epochs", "1"]}]
    jf = tmp_path / "jobs.json"
    jf.write_text(json.dumps(jobs))
    launcher.main(["--jobs", str(jf), "--dry-run"])
    out = capsys.readouterr()
    results = json.loads(out.out)
    assert results == [{"job": jobs[0], "status": "dry-run"}]
    assert "pts_pointnet_point-cat_nus_det_4x256_500e" in out.err

    # default matrix dry-runs 3 released point models
    launcher.main(["--dry-run"])
    results = json.loads(capsys.readouterr().out)
    assert len(results) == 3


def test_test_cli_end_to_end(tmp_path, capsys):
    """tools/test.py: checkpoint-eval entry produces the stratified JSON
    report (reference tools/test.py / testing_* configs, SURVEY §4.1)."""
    import importlib
    import json as _json
    import sys
    sys.path.insert(0, "tools")
    train_mod = importlib.import_module("train")
    test_mod = importlib.import_module("test")

    exp = "pts_point-transformer_point-cat_nus_det_4x256_500e"
    work = str(tmp_path / "run")
    # 1 tiny synthetic epoch -> checkpoint on disk
    train_mod.main([exp, "--epochs", "1", "--synthetic-objects", "30",
                    "--work-dir", work, "--seed", "0",
                    "--set", "model.backbone.mul=1",
                    "--set", "model.backbone_list=[8,4,2]",
                    "--set", "dataset.train.subsample_sparse=16",
                    "--set", "dataset.val.subsample_sparse=16"])
    ckpt = os.path.join(work, "ckpt_final")
    assert os.path.isdir(ckpt)
    capsys.readouterr()

    out = str(tmp_path / "eval")
    test_mod.main([exp, "--checkpoint", ckpt, "--work-dir", out,
                   "--synthetic-objects", "30", "--seed", "0",
                   "--set", "model.backbone.mul=1",
                   "--set", "model.backbone_list=[8,4,2]",
                   "--set", "dataset.train.subsample_sparse=16",
                   "--set", "dataset.val.subsample_sparse=16"])
    printed = _json.loads(capsys.readouterr().out)
    assert "val_match_acc" in printed
    report = _json.load(open(os.path.join(out, "eval_results_full.json")))
    assert "val_match_acc" in report
    # stratified sections present (per-class + bucket families)
    assert any(k.startswith("val_match_acc_") for k in report)
