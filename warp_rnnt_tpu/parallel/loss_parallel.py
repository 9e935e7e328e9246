"""Data-parallel RNN-T loss over a device mesh.

Two idiomatic routes, both returning results identical to the single-device
loss:

  * `rnnt_loss_sharded`: GSPMD route — annotate inputs with a batch sharding
    and call the ordinary loss under jit; XLA partitions the whole graph
    (the lattice DP is embarrassingly parallel over N, so no communication
    is needed until the final reduction).
  * `rnnt_loss_shard_map`: explicit-SPMD route — `shard_map` the per-shard
    loss and reduce with `psum`/`pmean` over the 'data' axis.  This is the
    recommended path inside larger shard_mapped training steps and for
    multi-host pods (per-host data loading feeds local shards).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map

from warp_rnnt_tpu.functional.loss import rnnt_loss
from warp_rnnt_tpu.parallel.mesh import batch_sharding


def rnnt_loss_sharded(
    mesh: Mesh,
    log_probs,
    labels,
    frames_lengths,
    labels_lengths,
    reduction: Optional[str] = "mean",
    **kwargs,
):
    """GSPMD data-parallel loss: inputs are constrained to batch sharding and
    the normal loss graph is partitioned by XLA."""
    log_probs = jax.lax.with_sharding_constraint(
        log_probs, batch_sharding(mesh, log_probs.ndim)
    )
    labels = jax.lax.with_sharding_constraint(
        labels, batch_sharding(mesh, labels.ndim)
    )
    return rnnt_loss(
        log_probs, labels, frames_lengths, labels_lengths,
        reduction=reduction, **kwargs,
    )


def rnnt_loss_shard_map(
    mesh: Mesh,
    log_probs,
    labels,
    frames_lengths,
    labels_lengths,
    reduction: Optional[str] = "mean",
    axis: str = "data",
    **kwargs,
):
    """Explicit-SPMD data-parallel loss with ICI reduction.

    Batch dim must divide the mesh 'data' axis size.  reduction='none'
    returns the per-sample costs (still batch-sharded); 'sum'/'mean' reduce
    with a psum/pmean collective.
    """

    def local_loss(lp, ys, xn, yn):
        costs = rnnt_loss(lp, ys, xn, yn, reduction="none", **kwargs)
        if reduction == "sum":
            return jax.lax.psum(costs.sum(), axis)
        if reduction == "mean":
            return jax.lax.pmean(costs.mean(), axis)
        return costs

    in_specs = (P(axis), P(axis), P(axis), P(axis))
    out_specs = P(axis) if reduction in (None, "none") else P()
    fn = shard_map(
        local_loss, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return fn(log_probs, labels, frames_lengths, labels_lengths)
