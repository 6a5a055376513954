"""Optimizer + LR/momentum schedule factory (optax).

Rebuilds the reference's schedule axis (configs_reid/_base_/schedules/*):
AdamW + mmcv one-cycle "cyclic" LR & momentum + global-norm gradient clipping +
optional gradient accumulation:

  optimizer = AdamW(lr, weight_decay=0.01)           (cyclic_500e_lr3e-4.py:7)
  lr: cos-anneal lr -> 10*lr over the first 40% of steps, then -> 1e-4*lr
      (target_ratio=(10, 1e-4), step_ratio_up=0.4, :10-15)
  momentum (beta1): 0.95 -> 0.85 -> 0.95 mirrored on the same phases (:16-21)
  grad_clip: global norm 35 (or 1 for *_norm1 configs) (:9)
  accumulation: optax.MultiSteps replaces GradientCumulativeFp16OptimizerHook
      (bugfix/cumulative_optimizer_fix.py:47-120)
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import optax


@dataclasses.dataclass
class ScheduleConfig:
    """One row of the reference schedule grid (configs name them
    cyclic_{E}e_lr{LR}[_norm1][_accumN])."""

    policy: str = "cyclic"                 # 'cyclic' | 'cosine' | 'fixed'
    lr: float = 3e-4
    weight_decay: float = 0.01
    max_epochs: int = 500
    grad_clip_norm: Optional[float] = 35.0
    cumulative_iters: int = 1
    # cyclic params (mmcv CyclicLrUpdaterHook defaults used by the configs)
    target_ratio: Tuple[float, float] = (10.0, 1e-4)
    step_ratio_up: float = 0.4
    momentum_base: float = 0.95
    momentum_ratio: Tuple[float, float] = (0.85 / 0.95, 1.0)


def _cos_anneal(start: float, end: float, pct: float) -> float:
    return end + (start - end) * (1 + math.cos(math.pi * pct)) / 2


def cyclic_schedule(base: float, total_steps: int,
                    target_ratio: Tuple[float, float] = (10.0, 1e-4),
                    step_ratio_up: float = 0.4):
    """mmcv one-cycle with cosine annealing within each phase."""
    up = max(1, int(total_steps * step_ratio_up))

    def fn(step):
        import jax.numpy as jnp
        step = jnp.minimum(step, total_steps - 1)
        pct_up = jnp.clip(step / up, 0.0, 1.0)
        pct_down = jnp.clip((step - up) / max(total_steps - up, 1), 0.0, 1.0)
        hi = base * target_ratio[0]
        lo = base * target_ratio[1]
        up_val = lo_cos(base, hi, pct_up)
        down_val = lo_cos(hi, lo, pct_down)
        return jnp.where(step < up, up_val, down_val)

    def lo_cos(start, end, pct):
        import jax.numpy as jnp
        return end + (start - end) * (1 + jnp.cos(jnp.pi * pct)) / 2

    return fn


def build_optimizer(cfg: ScheduleConfig, steps_per_epoch: int
                    ) -> optax.GradientTransformation:
    """AdamW with scheduled lr + beta1, clip-by-global-norm, accumulation."""
    total = max(1, cfg.max_epochs * steps_per_epoch)

    if cfg.policy == "cyclic":
        lr_fn = cyclic_schedule(cfg.lr, total, cfg.target_ratio,
                                cfg.step_ratio_up)
        b1_fn = cyclic_schedule(cfg.momentum_base, total, cfg.momentum_ratio,
                                cfg.step_ratio_up)
    elif cfg.policy == "cosine":
        lr_fn = optax.cosine_decay_schedule(cfg.lr, total)
        b1_fn = None
    else:
        lr_fn = lambda _: cfg.lr  # noqa: E731
        b1_fn = None

    def make_adamw(learning_rate, b1):
        return optax.adamw(learning_rate=learning_rate, b1=b1,
                           weight_decay=cfg.weight_decay)

    if b1_fn is not None:
        opt = optax.inject_hyperparams(make_adamw)(learning_rate=lr_fn,
                                                   b1=b1_fn)
    else:
        opt = optax.adamw(learning_rate=lr_fn,
                          weight_decay=cfg.weight_decay)

    chain = []
    if cfg.grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    chain.append(opt)
    tx = optax.chain(*chain)

    if cfg.cumulative_iters > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.cumulative_iters)
    return tx
