"""Experiment leaves: 4-axis composition + named experiment registry.

compose(dataset, model, schedule, runtime) mirrors the reference leaf pattern
(_base_ = [dataset, reidentifier, schedule, runtime],
configs_reid/reid_nuscenes_pts/pts_point-transformer_point-cat_nus_det_4x256_500e.py:1-27).

schedule('cyclic_500e_lr3e-4_norm1_accum2') parses the reference's schedule-file
naming grid directly (configs_reid/_base_/schedules/*) so every released
schedule is addressable by its original name.
"""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional

from ..train.schedules import ScheduleConfig
from . import datasets as D
from . import models as M


def schedule(name: str) -> ScheduleConfig:
    """Parse 'cyclic_{E}e_lr{LR}[_norm1][_accumN]' / 'cosine' names."""
    if name.startswith("cosine"):
        return ScheduleConfig(policy="cosine")
    m = re.match(r"cyclic_(\d+)e_lr([0-9.e-]+?)(_norm1)?(_accum(\d+))?$", name)
    if not m:
        raise ValueError(f"unknown schedule name: {name}")
    return ScheduleConfig(
        policy="cyclic",
        max_epochs=int(m.group(1)),
        lr=float(m.group(2)),
        grad_clip_norm=1.0 if m.group(3) else 35.0,
        cumulative_iters=int(m.group(5)) if m.group(5) else 1,
    )


def runtime(work_dir: Optional[str] = None, seed: int = 66,
            eval_interval: int = 25, checkpoint_interval: int = 5,
            log_interval: int = 50, validate: bool = False,
            deterministic: bool = False) -> Dict[str, Any]:
    """Runtime axis (reidentification_runtime.py: interval=5 ckpt, seed 66;
    *_testing.py flips validate/deterministic)."""
    return dict(work_dir=work_dir, seed=seed, eval_interval=eval_interval,
                checkpoint_interval=checkpoint_interval,
                log_interval=log_interval, validate=validate,
                deterministic=deterministic)


def compose(dataset: Dict[str, Any], model: Dict[str, Any],
            sched: ScheduleConfig, rt: Optional[Dict[str, Any]] = None,
            losses_to_use: Optional[Dict[str, bool]] = None,
            alpha: Optional[Dict[str, float]] = None) -> Dict[str, Any]:
    """One experiment dict: the unit train.py consumes."""
    cfg = dict(
        dataset=dataset,
        model=model,
        schedule=sched,
        runtime=rt or runtime(),
        # released configs train with the match loss only
        # (pts_point-transformer_point-cat_nus_det_4x256_500e.py:8-15)
        losses_to_use=losses_to_use or dict(match=True),
        alpha=alpha or {},
    )
    return cfg


# ---- named experiment registry (the reference's config leaves) --------------

def _nus_pts_flagship(**kw):
    return compose(D.nuscenes_pts(**kw), M.point_transformer_point_cat(),
                   schedule("cyclic_500e_lr3e-4"))


def _nus_pts_pointnet(**kw):
    return compose(D.nuscenes_pts(**kw), M.pointnet_point_cat(),
                   schedule("cyclic_500e_lr3e-4"))


def _nus_pts_dgcnn(**kw):
    return compose(D.nuscenes_pts(**kw), M.dgcnn_point_cat(),
                   schedule("cyclic_500e_lr3e-4"))


def _nus_pts_baseline(**kw):
    return compose(D.nuscenes_pts(**kw), M.point_transformer_baseline(),
                   schedule("cyclic_500e_lr3e-4"))


def _nus_pts_baseline_stnet(**kw):
    return compose(D.nuscenes_pts(**kw),
                   M.point_transformer_baseline(stnet=True),
                   schedule("cyclic_500e_lr3e-4"))


def _waymo_pts_flagship(**kw):
    return compose(D.waymo_pts(**kw),
                   M.point_transformer_point_cat(num_classes=6),
                   schedule("cyclic_400e_lr3e-4"))


def _num_point_ablation(n: int, **kw):
    # reid_waymo_pts/num_point_ablation/* trains at 160..2048 points
    return compose(D.waymo_pts(subsample_sparse=n, **kw),
                   M.point_transformer_point_cat(num_classes=6),
                   schedule("cyclic_400e_lr3e-4"))


def _nus_image_deit(variant: str, **kw):
    return compose(D.nuscenes_image(**kw), M.image_deit_point_cat(variant),
                   schedule("cyclic_200e_lr1e-5"),
                   losses_to_use=dict(match=True, cls=True, fp=True, vis=True,
                                      triplet=True))


# The registry is built generatively to cover the reference's full leaf
# matrix (166 config files, SURVEY.md §2.2): model family x dataset x
# schedule (incl. _accumN / _norm1) x point-count ablations x scaling runs x
# testing_* eval leaves. Names follow the reference file names.

EXPERIMENTS: Dict[str, Callable[..., Dict[str, Any]]] = {}


def _register(name: str, fn: Callable[..., Dict[str, Any]]):
    EXPERIMENTS[name] = fn


def _testing(train_fn):
    """testing_* leaf: same composition, eval-only runtime with deterministic
    seeded val pairs (reidentification_runtime_testing.py:17,44;
    model eval_only=True, testing_pts_*.py:10)."""
    def fn(**kw):
        cfg = train_fn(**kw)
        cfg["runtime"] = dict(cfg["runtime"], validate=True,
                              deterministic=True, eval_only=True)
        return cfg
    return fn


_PTS_MODELS = {
    "point-transformer_point-cat": lambda nc: M.point_transformer_point_cat(
        num_classes=nc),
    "pointnet_point-cat": lambda nc: M.pointnet_point_cat(num_classes=nc),
    "dgcnn_point-cat": lambda nc: M.dgcnn_point_cat(num_classes=nc),
    "point-transformer_baseline": lambda nc: M.point_transformer_baseline(),
    "point-transformer_baseline-stnet":
        lambda nc: M.point_transformer_baseline(stnet=True),
    "point-transformer-1.5M_point-cat":
        lambda nc: M.point_transformer_scaled("1.5M"),
    "point-transformer-7M_point-cat":
        lambda nc: M.point_transformer_scaled("7M"),
}

# ---- point leaves: nuScenes (500e grid) and Waymo (400e grid) ---------------
for _ds_name, _ds_fn, _nc, _e in (("nus", D.nuscenes_pts, 10, 500),
                                  ("waymo", D.waymo_pts, 6, 400)):
    for _m_name, _m_fn in _PTS_MODELS.items():
        def _mk(ds_fn=_ds_fn, m_fn=_m_fn, nc=_nc, e=_e, accum=1, pts=None,
                epochs=None, **kw):
            sname = f"cyclic_{epochs or e}e_lr3e-4" +                 (f"_accum{accum}" if accum > 1 else "")
            dkw = dict(kw)
            if pts:
                dkw["subsample_sparse"] = pts
            return compose(ds_fn(**dkw), m_fn(nc), schedule(sname))
        base = f"pts_{_m_name}_{_ds_name}_det_4x256_{_e}e"
        _register(base, _mk)
        _register("testing_" + base, _testing(_mk))
        for _a in (2, 4, 8):
            # bind _mk via default arg: a bare closure would late-bind to the
            # LAST loop iteration's factory
            _register(f"{base}_accum{_a}",
                      (lambda a, mk=_mk: lambda **kw: mk(accum=a, **kw))(_a))
    # point-count ablations (reid_waymo_pts/num_point_ablation/*,
    # reid_nuscenes_pts/num_point_ablation/*; 3 backbone families)
    for _m_name in ("point-transformer_point-cat", "pointnet_point-cat",
                    "dgcnn_point-cat"):
        for _n in (160, 192, 224, 256, 512, 1024, 2048):
            _register(
                f"pts_{_m_name}_{_ds_name}_det_4x256_{_e}e_{_n}pts",
                (lambda m=_m_name, n=_n, ds_fn=_ds_fn, nc=_nc, e=_e:
                 lambda **kw: compose(
                     ds_fn(subsample_sparse=n, **kw),
                     _PTS_MODELS[m](nc),
                     schedule(f"cyclic_{e}e_lr3e-4")))())

# scaling runs (scaling_*: waymo 800/1600/3200e, nuscenes 1000/2000/4000e —
# download_pretrained.sh:15-17)
for _e in (800, 1600, 3200):
    _register(
        f"scaling_pts_point-transformer_point-cat_waymo_det_4x256_{_e}e",
        (lambda e=_e: lambda **kw: compose(
            D.waymo_pts(**kw), M.point_transformer_point_cat(num_classes=6),
            schedule(f"cyclic_{e}e_lr3e-4")))())
for _e in (1000, 2000, 4000):
    _register(
        f"scaling_pts_point-transformer_point-cat_nus_det_4x256_{_e}e",
        (lambda e=_e: lambda **kw: compose(
            D.nuscenes_pts(**kw), M.point_transformer_point_cat(),
            ScheduleConfig(policy="cyclic", max_epochs=e, lr=3e-4)))())

# backward-compat aliases for the round-1 names
for _n in (256, 512):
    _register(
        f"pts_point-transformer_point-cat_{_n}pts_nus_det_4x256_500e",
        (lambda n=_n: lambda **kw: compose(
            D.nuscenes_pts(subsample_sparse=n, **kw),
            M.point_transformer_point_cat(),
            schedule("cyclic_500e_lr3e-4")))())
for _n in (160, 256, 512, 1024, 2048):
    _register(f"pts_point-transformer_point-cat_waymo_{_n}pts",
              EXPERIMENTS[
                  f"pts_point-transformer_point-cat_waymo_det_4x256_400e_{_n}pts"])

# ---- image leaves (reid_nuscenes_image/, reid_waymo_image/) -----------------
for _ds_name, _img_ds, _nc, _e in (("nus", D.nuscenes_image, 10, 200),
                                   ("waymo", D.waymo_image, 6, 200)):
    for _v, _tag in (("deit-tiny", "deit-tiny_point-cat_pt"),
                     ("deit-base", "deit-base_point-cat_pt"),
                     ("deit-tiny-no-pt", "deit-tiny_point-cat_r"),
                     ("deit-base-no-pt", "deit-base_point-cat_r"),
                     ("beit", "beit-base-lin-xcorr")):
        def _mk_img(v=_v, img_ds=_img_ds, nc=_nc, e=_e, **kw):
            cfg = compose(
                img_ds(**kw),
                M.image_deit_point_cat(v, num_classes=nc,
                                       pretrained="no-pt" not in v),
                schedule(f"cyclic_{e}e_lr1e-5"),
                losses_to_use=dict(match=True, cls=True, fp=True, vis=True,
                                   triplet=True))
            # image leaves set triplet_loss=dict(margin=10, p=2)
            # (rgb_deit-*_point-cat_*.py:25-27); point default is 0.2
            cfg["triplet_margin"] = 10.0
            return cfg
        name = f"rgb_{_tag}_{_ds_name}_det_4x60_{_e}e"
        _register(name, _mk_img)
        _register("testing_" + name, _testing(_mk_img))

# round-1 image aliases
_register("image_deit-tiny_point-cat_nus_det_4x60_200e",
          EXPERIMENTS["rgb_deit-tiny_point-cat_pt_nus_det_4x60_200e"])
_register("image_deit-base_point-cat_nus_det_4x60_200e",
          EXPERIMENTS["rgb_deit-base_point-cat_pt_nus_det_4x60_200e"])
_register("image_beit-base_nus_det_4x60_200e",
          EXPERIMENTS["rgb_beit-base-lin-xcorr_nus_det_4x60_200e"])


def apply_overrides(cfg: Dict[str, Any], assignments) -> Dict[str, Any]:
    """In-place dotted-path config overrides — the reference's --cfg-options
    (tools/test.py:80-93 DictAction: 'key.sub=val' with literal-eval values,
    comma-separated lists). Works through nested dicts and dataclass axes
    (ScheduleConfig): `losses_to_use.kl=true`, `schedule.lr=1e-4`,
    `model.backbone.mul=2`, `dataset.train.subsample_sparse=256`.

    Unknown paths raise KeyError/AttributeError rather than silently creating
    config that nothing reads.
    """
    import ast

    def parse_val(v: str):
        low = v.lower()
        if low in ("true", "false"):
            return low == "true"
        if low in ("none", "null"):
            return None
        try:
            r = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            return v
        # bare comma lists ('64,32,16') literal-eval to tuples; configs use
        # lists
        return list(r) if isinstance(r, tuple) else r

    for assignment in assignments or ():
        if "=" not in assignment:
            raise ValueError(f"override must be key.path=value, "
                             f"got {assignment!r}")
        path, _, raw = assignment.partition("=")
        keys = path.strip().split(".")
        node = cfg
        for k in keys[:-1]:
            node = node[k] if isinstance(node, dict) else getattr(node, k)
        leaf = keys[-1]
        val = parse_val(raw.strip())
        if isinstance(node, dict):
            # Existing keys are replaced; NEW leaf keys are allowed when the
            # parent is a component dict (has a 'type'), because builders
            # read optional knobs via cfg.get() that factories never
            # materialize (fused_train, pallas_inference, knn_method, ...) —
            # mmcv --cfg-options semantics. Unknown leaves elsewhere still
            # raise to catch typos, as does a missing intermediate path.
            if leaf not in node and "type" not in node:
                raise KeyError(f"unknown config key {path!r} "
                               f"(no {leaf!r} in {sorted(node)})")
            node[leaf] = val
        else:
            if not hasattr(node, leaf):
                raise AttributeError(f"unknown config key {path!r}")
            setattr(node, leaf, val)
    return cfg


def get_experiment(name: str, set_options=None, **overrides) -> Dict[str, Any]:
    if name not in EXPERIMENTS:
        raise KeyError(f"unknown experiment {name}; known: "
                       f"{sorted(EXPERIMENTS)}")
    return apply_overrides(EXPERIMENTS[name](**overrides), set_options)
