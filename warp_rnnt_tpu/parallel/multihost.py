"""Multi-host (pod-slice) support.

The reference has no distributed story at all (SURVEY §2: single GPU, no
NCCL/MPI).  Here multi-host runs are first-class the JAX way:

  * `initialize(...)` — thin wrapper over `jax.distributed.initialize`
    (coordinator address/process id/count from env or args);
  * `global_batch(...)` — assemble a globally-sharded batch from per-host
    local shards via `jax.make_array_from_process_local_data`;
  * `pod_mesh(...)` — mesh over all global devices with a 'data' axis.

The loss itself needs nothing special: it is batch-parallel, XLA reduces
costs over ICI/DCN via the shardings (`loss_parallel.py`).  Per-host data
loading should bucket/pad locally (see `warp_rnnt_tpu.utils.batching`) so
every host contributes equally-shaped shards.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize the JAX distributed runtime (no-op if single-process)."""
    num_processes = num_processes or int(os.environ.get("WARP_RNNT_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("WARP_RNNT_COORDINATOR", "localhost:12321"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("WARP_RNNT_PROCESS_ID", "0")),
    )


def pod_mesh(axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Mesh over all global devices (multi-host aware)."""
    devs = np.asarray(jax.devices())
    if len(axis_names) == 1:
        shape = (devs.size,)
    else:
        shape = (devs.size, 1)
    return Mesh(devs.reshape(shape), tuple(axis_names))


def global_batch(mesh: Mesh, tree, axis: str = "data"):
    """Build global arrays from per-process local batch shards.

    Each process passes its LOCAL shard (same shape on every host); the
    result is a global array whose leading dim is num_processes x local.
    """
    def build(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(build, tree)
