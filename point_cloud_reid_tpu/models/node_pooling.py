"""Gated graph pooling (GGS-NN style readouts).

Behavioral rebuild of mmdet3d/models/trackers/deprecated/node_pooling.py:23-104
(EdgeGatedPooling / GatedPooling — modified "Gated Graph Sequence Neural
Networks" global pooling), dead code in the reference; live here.

The reference pools a flat node list into per-graph vectors via
torch_scatter.scatter over a batch-assignment vector. The TPU-native
equivalent is `jax.ops.segment_sum` with a STATIC segment count, so the
whole readout jits to fixed shapes: callers pass `num_graphs` (pad unused
graph slots; they come back as zero rows, exactly torch_scatter's dim_size
semantics).

Quirk NOT carried: the reference defines htheta_node/htheta_edge transform
MLPs that its forward never applies — gates multiply RAW features
(node_pooling.py:62-68, 101-104). We omit the dead parameters entirely (no
released checkpoint contains them; the converter would skip them anyway).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _segment_sum(x: jnp.ndarray, seg: jnp.ndarray, num: int) -> jnp.ndarray:
    return jax.ops.segment_sum(x, seg, num_segments=num)


class GatedPooling(nn.Module):
    """Per-graph sum of gate(node) * node (node_pooling.py:70-104)."""

    node_dim: int
    pooling_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, node_features: jnp.ndarray, batch_list: jnp.ndarray,
                 num_graphs: int) -> jnp.ndarray:
        """node_features: (Nn, node_dim); batch_list: (Nn,) int graph ids.
        Returns (num_graphs, pooling_dim)."""
        alpha = nn.Dense(1, dtype=self.dtype, name="hgate_node_0")(node_features)
        pooled = _segment_sum(alpha * node_features, batch_list, num_graphs)
        return nn.Dense(self.pooling_dim, dtype=self.dtype,
                        name="poolingLayer_0")(pooled)


class EdgeGatedPooling(nn.Module):
    """Node + edge gated readout (node_pooling.py:23-68)."""

    node_dim: int
    edge_dim: int
    pooling_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, node_features: jnp.ndarray, edge_features: jnp.ndarray,
                 node_batch_list: jnp.ndarray, edge_batch_list: jnp.ndarray,
                 num_graphs: int) -> jnp.ndarray:
        """(Nn, node_dim), (Ne, edge_dim) -> (num_graphs, pooling_dim)."""
        na = nn.Dense(1, dtype=self.dtype, name="hgate_node_0")(node_features)
        ea = nn.Dense(1, dtype=self.dtype, name="hgate_edge_0")(edge_features)
        node_pool = _segment_sum(na * node_features, node_batch_list, num_graphs)
        edge_pool = _segment_sum(ea * edge_features, edge_batch_list, num_graphs)
        both = jnp.concatenate([node_pool, edge_pool], axis=-1)
        return nn.Dense(self.pooling_dim, dtype=self.dtype,
                        name="poolingLayer_0")(both)
