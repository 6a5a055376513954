"""Parallelism layer: device mesh + sharding specs.

TPU-native replacement for the reference's NCCL stack (SURVEY.md §2.6):
torchpack dist.init + MMDistributedDataParallel + DistributedSampler +
tmpdir eval gather all collapse into SPMD jit over a Mesh — gradients are
reduced by XLA collectives inside the compiled step, batch-norm statistics are
global automatically, and eval metrics come back as sharded arrays.
"""
from .distributed import (allgather_results, barrier, dp_step_check,
                          init_distributed)
from .mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    sync_hosts,
)

__all__ = ["allgather_results", "barrier", "batch_sharding", "dp_step_check",
           "init_distributed", "make_mesh", "replicated", "shard_batch",
           "sync_hosts"]
