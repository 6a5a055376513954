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
from typing import Dict, Optional

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


def dp_step_check(batch_per_device: int = 2) -> float:
    """One deterministic DP train step over ALL global devices -> loss.

    The same program runs single- or multi-process (the reference's
    correctness criterion for `torchpack dist-run -np N`: N processes
    compute what one does, tools/train.py:26). Each process contributes its
    process-local batch rows via shard_batch; params are initialized from a
    fixed PRNGKey so every host holds identical replicated state.
    tests/test_multihost.py runs this on a 2-process CPU cluster and compares
    against the single-process value.
    """
    import jax
    from ..configs import get_experiment
    from ..models import build_model
    from ..train import TrainState, build_optimizer, make_train_step
    from ..train.schedules import ScheduleConfig
    from .mesh import make_mesh, shard_batch

    cfg = get_experiment("pts_point-transformer_point-cat_nus_det_4x256_500e")
    mcfg = dict(cfg["model"])
    mcfg["backbone"] = dict(mcfg["backbone"], mul=1)
    mcfg["backbone_list"] = [16, 8, 4]
    model = build_model(mcfg)

    n_dev = jax.device_count()
    B, N = batch_per_device * n_dev, 16
    rs = np.random.RandomState(0)
    full = dict(
        sparse_1=rs.randn(B, N, 3).astype(np.float32),
        sparse_2=rs.randn(B, N, 3).astype(np.float32),
        label_1=np.zeros((B,), np.int32),
        label_2=np.ones((B,), np.int32),
        id_1=np.arange(B, dtype=np.int32),
        id_2=np.arange(B, dtype=np.int32) % 3,
    )
    p, pc = jax.process_index(), jax.process_count()
    rows = B // pc
    local = {k: v[p * rows:(p + 1) * rows] for k, v in full.items()}

    tx = build_optimizer(ScheduleConfig(max_epochs=1), steps_per_epoch=10)
    state = TrainState.create(model, tx, local,
                              rng=jax.random.PRNGKey(2))
    # host-local numpy params enter the global jit as replicated values —
    # identical on every process by construction (fixed init key)
    state = jax.tree_util.tree_map(np.asarray, state)
    train_step = make_train_step(model, tx, losses_to_use=dict(match=True),
                                 alpha={}, donate=False)
    mesh = make_mesh()
    with mesh:
        batch = shard_batch(mesh, local)
        _, log = train_step(state, batch, jax.random.PRNGKey(3))
    return float(log["reid_loss"])
