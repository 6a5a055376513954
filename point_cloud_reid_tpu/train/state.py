"""TrainState + model/optimizer initialization.

Replaces the mmcv Runner's mutable model/optimizer objects with one immutable
pytree — params, BN batch_stats, optimizer state, step — updated functionally by
the jitted train step. Mixed precision follows the TPU recipe (SURVEY.md §2.6
row "Mixed precision"): params and optimizer state stay f32, compute runs in
the model's dtype (bf16 on TPU); no loss scaling needed.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, model, tx: optax.GradientTransformation,
               sample_batch: Dict[str, jnp.ndarray],
               rng: Optional[jax.Array] = None) -> "TrainState":
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        variables = model.init(rng, sample_batch, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return cls(params=params, batch_stats=batch_stats,
                   opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))

    @property
    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
