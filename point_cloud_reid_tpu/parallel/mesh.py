"""Device mesh construction + sharding helpers.

The reference's data parallelism is one process per GPU with NCCL bucket
all-reduce (apis/train.py:48-56). Here the equivalent is declarative:

  mesh = make_mesh(data=N)                    # N chips on the 'data' axis
  batch = shard_batch(mesh, host_batch)       # axis-0 sharded device arrays
  state = jax.device_put(state, replicated(mesh))
  step = jax.jit(train_step)                  # XLA inserts psum over ICI

Axes:
  'data'  — batch dimension (DP). The only axis the ReID workload needs at
            reference scale (models <= 7M params, SURVEY.md §2.6).
  'pairs' — optional second axis for sharding the NxN pair-scoring workload
            (inference engine, SURVEY.md §3.5); unused in training.

Multi-host: call `jax.distributed.initialize()` before make_mesh — ICI carries
intra-slice collectives, DCN the cross-slice ones; no code change needed here.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, pairs: int = 1,
              devices=None) -> Mesh:
    """Build a (data, pairs) mesh over the available devices.

    Args:
        data: size of the data axis; defaults to all devices / pairs.
        pairs: size of the pair-sharding axis (inference only).
    """
    devices = devices if devices is not None else jax.devices()
    if data is None:
        data = len(devices) // pairs
    grid = np.asarray(devices[:data * pairs]).reshape(data, pairs)
    return Mesh(grid, axis_names=("data", "pairs"))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Axis-0 (batch) sharding — the DistributedSampler equivalent."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding for params/opt state (pure DP)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Any], axis: str = "data"):
    """Device-put a host batch with axis-0 sharding over the mesh.

    Replaces per-rank DistributedSampler + scatter. Single-process: each host
    feeds its full batch and XLA slices rows onto chips. Multi-process (mesh
    spans hosts): each process feeds its PROCESS-LOCAL rows — the per-rank
    shard, exactly the DistributedSampler contract — and the global array is
    assembled across hosts (tests/test_multihost.py exercises this on a
    2-process CPU cluster)."""
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def sync_hosts(name: str = "sync"):
    """Cross-host barrier (replaces dist.barrier(),
    custom_optim_hook.py:55-57). No-op on a single host."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
