"""Training subsystem: pure-functional pjit training loop.

Replaces the reference's mmcv Runner + OptimizerHook + Fp16OptimizerHook +
GradientCumulative hooks + CheckpointHook stack (mmdet3d/apis/train.py:20-134,
bugfix/cumulative_optimizer_fix.py) with:

  losses.py     — pure loss functions of ReIDNet forward outputs
  schedules.py  — optax AdamW + cyclic/cosine LR & momentum + global-norm clip
  state.py      — TrainState (params, batch_stats, opt_state) + bf16 policy
  loop.py       — jit/pjit train_step + epoch driver + hooks
  convert.py    — torch .pth checkpoint -> flax params converter
"""
from .losses import reid_losses, match_metrics  # noqa: F401
from .schedules import ScheduleConfig, build_optimizer  # noqa: F401
from .state import TrainState, param_count  # noqa: F401
from .loop import Trainer, make_eval_step, make_train_step  # noqa: F401
