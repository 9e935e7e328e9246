"""Device-mesh construction helpers.

The reference is strictly single-GPU (SURVEY §2: no NCCL/MPI/torch.distributed
anywhere); this package makes multi-chip/multi-host first-class the TPU way:
a named `jax.sharding.Mesh`, batch ('data') sharding for the loss, and an
optional 'model' axis for vocabulary-sharded joint networks.  XLA inserts the
collectives (psum over ICI) from the shardings.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over all (or the given) devices.

    With the default 1-D ('data',) layout every device holds a batch shard —
    the natural parallelism for an utterance-level loss.  Pass
    ``axis_names=('data', 'model')`` and a 2-D shape for batch x vocab
    sharding of a joint network.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n,) if len(axis_names) == 1 else (n, 1)
    devs = np.asarray(devices).reshape(tuple(mesh_shape))
    return Mesh(devs, tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """NamedSharding that splits dim 0 over `axis`, replicates the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place every array in `tree` with its leading dim sharded over `axis`."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim, axis)), tree
    )
