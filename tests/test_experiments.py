"""Experiment registry: full-matrix build + schedule-name parser grid."""
import jax
import jax.numpy as jnp
import pytest

from point_cloud_reid_tpu.configs import experiments as E
from point_cloud_reid_tpu.models import build_model

pytestmark = pytest.mark.quick


def test_all_experiments_build():
    assert len(E.EXPERIMENTS) >= 140
    for name in E.EXPERIMENTS:
        cfg = E.get_experiment(name)
        for axis in ("dataset", "model", "schedule", "runtime",
                     "losses_to_use"):
            assert axis in cfg, f"{name} missing {axis}"


def test_testing_leaves_flip_runtime():
    cfg = E.get_experiment("testing_pts_point-transformer_point-cat_nus_det_4x256_500e")
    assert cfg["runtime"]["eval_only"] and cfg["runtime"]["deterministic"]


@pytest.mark.parametrize("name,epochs,lr,clip,accum", [
    ("cyclic_500e_lr3e-4", 500, 3e-4, 35.0, 1),
    ("cyclic_200e_lr1e-5_norm1_accum2", 200, 1e-5, 1.0, 2),
    ("cyclic_400e_lr3e-4_accum8", 400, 3e-4, 35.0, 8),
])
def test_schedule_parser(name, epochs, lr, clip, accum):
    s = E.schedule(name)
    assert (s.max_epochs, s.lr, s.grad_clip_norm, s.cumulative_iters) == \
        (epochs, lr, clip, accum)


@pytest.mark.parametrize("name", [
    "pts_point-transformer_baseline_nus_det_4x256_500e",
    "pts_point-transformer_baseline-stnet_nus_det_4x256_500e",
    "pts_pointnet_point-cat_waymo_det_4x256_400e",
])
def test_model_families_init(name):
    cfg = E.get_experiment(name)
    model = build_model(cfg["model"])
    B, N = 2, 32
    batch = dict(sparse_1=jnp.zeros((B, N, 3)), sparse_2=jnp.zeros((B, N, 3)),
                 id_1=jnp.zeros((B,), jnp.int32),
                 id_2=jnp.zeros((B,), jnp.int32))
    out = model.apply(model.init(jax.random.PRNGKey(0), batch, train=False),
                      batch, train=False)
    assert out["match_logits"].shape == (B,)


def test_apply_overrides_round_trip():
    """--set overrides land in the built model/dataset (reference
    --cfg-options, tools/test.py:80-93)."""
    name = "pts_point-transformer_point-cat_nus_det_4x256_500e"
    cfg = E.get_experiment(name, set_options=[
        "losses_to_use.match=true",
        "model.backbone.mul=2",
        "schedule.lr=1e-4",
        "dataset.train.subsample_sparse=64",
        "model.combine=cat",
    ])
    assert cfg["model"]["backbone"]["mul"] == 2
    assert cfg["schedule"].lr == 1e-4
    assert cfg["dataset"]["train"]["subsample_sparse"] == 64
    model = build_model(cfg["model"])
    assert model.combine == "cat"
    assert model.backbone["mul"] == 2

    # component dicts (they carry a 'type') accept NEW optional knobs that
    # the factories never materialize but builders read via cfg.get() —
    # e.g. the fused-train opt-in must round-trip into the built module
    cfg2 = E.get_experiment(name, set_options=[
        "model.backbone.fused_train=true"])
    assert cfg2["model"]["backbone"]["fused_train"] is True
    assert build_model(cfg2["model"]).backbone["fused_train"] is True

    # the remat_stages capacity knob plumbs CLI -> registry -> module
    # (tools/profile_train_table.py --remat / --set
    # model.backbone.remat_stages=0,1,2)
    from point_cloud_reid_tpu.models.registry import build_backbone
    cfg3 = E.get_experiment(name, set_options=[
        "model.backbone.remat_stages=0,2"])
    assert cfg3["model"]["backbone"]["remat_stages"] == [0, 2]
    bb = build_backbone(cfg3["model"]["backbone"])
    assert tuple(bb.remat_stages) == (0, 2)

    # unknown keys on non-component dicts / missing paths still fail loudly
    with pytest.raises(KeyError):
        E.get_experiment(name, set_options=["dataset.not_a_key=1"])
    with pytest.raises((KeyError, TypeError)):
        E.get_experiment(name, set_options=["not_a_section.x=1"])
    with pytest.raises(ValueError):
        E.get_experiment(name, set_options=["model.combine"])


def test_apply_overrides_value_parsing():
    cfg = E.get_experiment("pts_point-transformer_point-cat_nus_det_4x256_500e")
    E.apply_overrides(cfg, ["model.backbone_list=64,32,16",
                            "model.local_stage1=none",
                            "runtime.validate=True"])
    assert cfg["model"]["backbone_list"] == [64, 32, 16]
    assert cfg["model"]["local_stage1"] is None
    assert cfg["runtime"]["validate"] is True
