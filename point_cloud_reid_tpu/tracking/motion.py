"""Track motion models: constant velocity + learned LSTM incrementor.

Equivalent of the reference's track-state propagation machinery
(trackers/deprecated/: TrackingIncrementorLSTM — a learned per-track state
update, TrackingUpdater — box refinement after association,
track.transform_over_time's 'velocity' method). The LSTM is a flax scan over
the track's observation history, producing a BEV displacement increment;
constant-velocity is the closed-form default used by TrackingManager.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def constant_velocity_step(box: jnp.ndarray, velocity: jnp.ndarray,
                           dt: float = 1.0) -> jnp.ndarray:
    """(7,) box + (2,) BEV velocity -> propagated box
    (track.transform_over_time 'velocity', track.py:116-183)."""
    return box.at[:2].add(velocity * dt)


class LSTMIncrementor(nn.Module):
    """Learned displacement model over a track's observation sequence.

    Input: (B, T, F) per-timestep features (e.g. box deltas ‖ confidence ‖
    class one-hot). Output: (B, 2) predicted next BEV displacement.
    (TrackingIncrementorLSTM semantics: LSTM over history -> linear head.)
    """

    hidden: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, seq: jnp.ndarray,
                 lengths: jnp.ndarray | None = None) -> jnp.ndarray:
        B, T, F = seq.shape
        ScanLSTM = nn.scan(nn.OptimizedLSTMCell,
                           variable_broadcast="params",
                           split_rngs={"params": False},
                           in_axes=1, out_axes=1)
        cell = ScanLSTM(self.hidden, dtype=self.dtype, name="lstm")
        carry = cell.initialize_carry(jax.random.PRNGKey(0), seq[:, 0].shape)
        _, ys = cell(carry, seq)
        # masked last-output selection for variable-length histories
        if lengths is not None:
            idx = jnp.clip(lengths - 1, 0, T - 1)
            last = jnp.take_along_axis(ys, idx[:, None, None], axis=1)[:, 0]
        else:
            last = ys[:, -1]
        return nn.Dense(2, dtype=self.dtype, name="head")(last)


class BoxUpdater:
    """Post-association box refinement (TrackingUpdater semantics):
    exponential smoothing of dims/yaw, detection-driven center."""

    def __init__(self, dim_momentum: float = 0.7, yaw_momentum: float = 0.7):
        self.dim_momentum = dim_momentum
        self.yaw_momentum = yaw_momentum

    def __call__(self, track_box: jnp.ndarray, det_box: jnp.ndarray
                 ) -> jnp.ndarray:
        out = det_box
        dims = (self.dim_momentum * track_box[3:6]
                + (1 - self.dim_momentum) * det_box[3:6])
        # shortest-path yaw blend
        dyaw = jnp.arctan2(jnp.sin(det_box[6] - track_box[6]),
                           jnp.cos(det_box[6] - track_box[6]))
        yaw = track_box[6] + (1 - self.yaw_momentum) * dyaw
        return jnp.concatenate([out[:3], dims, yaw[None]])
