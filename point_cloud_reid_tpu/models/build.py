"""Top-level model factory: config dict -> flax module.

Equivalent of the reference's FUSIONMODELS registry + build_model
(mmdet3d/models/builder.py:5-55): dispatch on cfg['type'].
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from .image_reid import ImageReIDNet
from .reid_net import ReIDNet, ReIDNetCosine


def build_model(cfg: Dict[str, Any], dtype=jnp.float32):
    cfg = dict(cfg)
    t = cfg.pop("type", "ReIDNet")
    if t == "ReIDNet":
        cls = ReIDNet
    elif t == "ReIDNetCosine":
        cls = ReIDNetCosine
    elif t == "ImageReIDNet":
        cls = ImageReIDNet
    else:
        raise NotImplementedError(f"model type {t}")
    # silently drop reference-only config fields with no module counterpart
    import dataclasses
    valid = {f.name for f in dataclasses.fields(cls)}
    cfg = {k: v for k, v in cfg.items() if k in valid}
    return cls(dtype=dtype, **cfg)
