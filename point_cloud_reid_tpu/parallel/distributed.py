"""Multi-host (multi-slice / multi-process) utilities.

Replaces the reference's NCCL bootstrap stack — torchpack `dist.init()`
(tools/train.py:26), `MMDistributedDataParallel` wrap (apis/train.py:51-56),
explicit barriers (custom_optim_hook.py:55-57), and the tmpdir-pickle eval
gather (core/hooks/eval_hook.py:113-135) — with the JAX equivalents:
process bootstrap via `jax.distributed.initialize` (ICI intra-slice, DCN
across slices), gradient reduction fused by XLA inside the pjit step, and
eval-metric gather over collectives instead of the filesystem.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Dict[str, int]:
    """Initialize multi-process JAX when launched on multiple hosts.

    No-ops on a single process (the common single-host case: one process
    drives all local chips via SPMD). With explicit args or the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars,
    performs the DCN rendezvous.
    """
    import jax
    n = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if n > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ.get("JAX_COORDINATOR_ADDRESS"),
            num_processes=n,
            process_id=process_id
            if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "0")))
    return dict(process_index=jax.process_index(),
                process_count=jax.process_count(),
                local_devices=jax.local_device_count(),
                global_devices=jax.device_count())


def allgather_results(results: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Gather per-host eval arrays across all processes.

    The collective replacement for multi_gpu_test's tmpdir pickle gather
    (eval_hook.py:113-128): every host contributes its shard of per-pair
    results; all hosts receive the concatenation (rank-0-only logic is then a
    caller-side `if jax.process_index() == 0`).
    """
    import jax
    if jax.process_count() == 1:
        return results
    from jax.experimental import multihost_utils
    out = {}
    for k, v in results.items():
        gathered = multihost_utils.process_allgather(np.asarray(v))
        # (P_hosts, n, ...) -> (P_hosts * n, ...)
        out[k] = np.concatenate(list(gathered), axis=0) \
            if gathered.ndim > v.ndim else gathered
    return out


def barrier(name: str = "barrier") -> None:
    """Global device barrier (the reference's dist.barrier,
    custom_optim_hook.py:55-57 / datasets/utils.py:169-170)."""
    import jax
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
