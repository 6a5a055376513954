"""Orbax checkpoint save/load roundtrip through the Trainer (resume path)."""
import numpy as np

import jax
import jax.numpy as jnp

from point_cloud_reid_tpu.data import BatchLoader, SyntheticStore, \
    build_pair_dataset
from point_cloud_reid_tpu.configs import get_experiment
from point_cloud_reid_tpu.models import build_model
from point_cloud_reid_tpu.train import Trainer, TrainState, build_optimizer
from point_cloud_reid_tpu.train.schedules import ScheduleConfig


def _tiny_setup(tmp_path):
    cfg = get_experiment("pts_point-transformer_point-cat_nus_det_4x256_500e")
    mcfg = dict(cfg["model"])
    mcfg["backbone"] = dict(mcfg["backbone"], mul=1)
    mcfg["backbone_list"] = [8, 4, 2]
    model = build_model(mcfg)
    store = SyntheticStore(num_objects=80, frames_per_obj=4, seed=0,
                           class_names=list(cfg["dataset"]["train"]["classes"]))
    dcfg = dict(cfg["dataset"]["train"], subsample_sparse=16)
    ds = build_pair_dataset(dcfg, store)
    loader = BatchLoader(ds, batch_size=8, shuffle=True)
    tx = build_optimizer(ScheduleConfig(max_epochs=1), steps_per_epoch=2)
    runtime = dict(work_dir=str(tmp_path), seed=0, max_epochs=1,
                   losses_to_use=dict(match=True), alpha={},
                   cls_to_idx=cfg["dataset"]["cls_to_idx"],
                   num_classes=cfg["dataset"]["num_classes"])
    trainer = Trainer(model, tx, loader, loader, runtime)
    batch = next(iter(loader))
    state = TrainState.create(model, tx, batch, rng=jax.random.PRNGKey(0))
    return trainer, state, batch


def test_checkpoint_roundtrip(tmp_path):
    trainer, state, batch = _tiny_setup(tmp_path)
    # advance a step so opt_state/step are non-trivial
    from point_cloud_reid_tpu.parallel import shard_batch
    dev_batch = shard_batch(trainer.mesh, batch)
    state, _ = trainer.train_step(state, dev_batch, jax.random.PRNGKey(1))

    trainer.save_checkpoint(state, tag="rt")
    fresh = TrainState.create(trainer.model, trainer.tx, batch,
                              rng=jax.random.PRNGKey(7))
    restored = trainer.load_checkpoint(fresh, str(tmp_path / "ckpt_rt"))

    assert int(restored.step) == int(state.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state.params)),
                    jax.tree_util.tree_leaves(
                        jax.device_get(restored.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (resume_from semantics)
    for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(state.opt_state)),
            jax.tree_util.tree_leaves(jax.device_get(restored.opt_state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored state trains on
    s2, log = trainer.train_step(restored, dev_batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(log["reid_loss"]))


def test_evaluate_pipelined_matches_serial(tmp_path):
    """Queue-then-drain eval dispatch (eval_prefetch window) must not change
    results vs fetching after every batch (window=1)."""
    trainer, state, _ = _tiny_setup(tmp_path)
    trainer.cfg["eval_prefetch"] = 8
    pipelined = trainer.evaluate(state)
    trainer.cfg["eval_prefetch"] = 1
    serial = trainer.evaluate(state)
    assert pipelined.keys() == serial.keys()
    for k, v in pipelined.items():
        if isinstance(v, (int, float)):
            assert v == serial[k], k


def test_checkpoint_retention_policy(tmp_path):
    """interval-tagged saves with max_keep_ckpts rotation + save_last + best
    (checkpoint_config parity, reidentification_runtime.py:7)."""
    import os
    trainer, state, batch = _tiny_setup(tmp_path)
    trainer.cfg.update(max_epochs=4, checkpoint_interval=1, max_keep_ckpts=2,
                       save_last=True, eval_interval=2, save_best=True)
    state = trainer.fit(state)

    have = sorted(p for p in os.listdir(tmp_path) if p.startswith("ckpt_"))
    assert "ckpt_epoch_3" in have and "ckpt_epoch_4" in have
    assert "ckpt_epoch_1" not in have and "ckpt_epoch_2" not in have  # rotated
    assert "ckpt_last" in have and "ckpt_final" in have
    assert "ckpt_best" in have

    # resume from an interval checkpoint and keep training
    fresh = TrainState.create(trainer.model, trainer.tx, batch,
                              rng=jax.random.PRNGKey(9))
    restored = trainer.load_checkpoint(fresh, str(tmp_path / "ckpt_epoch_3"))
    assert int(restored.step) == 3 * len(trainer.train_loader)
    from point_cloud_reid_tpu.parallel import shard_batch
    dev_batch = shard_batch(trainer.mesh, batch)
    _, log = trainer.train_step(restored, dev_batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(log["reid_loss"]))
