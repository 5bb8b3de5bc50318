"""Multi-host (DCN) initialization and data sharding helpers.

The reference is strictly single-process (SURVEY.md §2). Scaling past one
host in JAX needs only (a) ``jax.distributed.initialize`` per process and
(b) per-process batch feeding with a global mesh — the same sharded train
steps in ``tsr_tpu.train.common`` then run unchanged: XLA routes gradient /
batch-norm reductions over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX. No-ops on single-process setups.

    Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``); on Cloud TPU pods a bare
    ``jax.distributed.initialize()`` autodetects everything.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    # `is None` (not `or`): process_id 0 — the coordinator process itself —
    # is falsy, and `or` would erase it (caught by tests/test_distributed)
    n = (num_processes if num_processes is not None
         else _int_env("JAX_NUM_PROCESSES"))
    pid = (process_id if process_id is not None
           else _int_env("JAX_PROCESS_ID"))
    if coordinator is None and n is None:
        try:
            jax.distributed.initialize()  # autodetected (TPU pod) or no-op
        except Exception:
            pass  # single-process
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=n, process_id=pid)


def _int_env(name):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def process_shard(indices: np.ndarray) -> np.ndarray:
    """Split a global index set across processes (each host feeds its own
    slice of the global batch)."""
    return np.array_split(indices, jax.process_count())[jax.process_index()]


def make_global_batch(local_batch: np.ndarray, mesh) -> jax.Array:
    """Assemble a globally-sharded array from per-process local batches
    (the multi-host analogue of parallel.mesh.shard_batch)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    global_shape = (local_batch.shape[0] * jax.process_count(),
                    *local_batch.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, local_batch, global_shape)
