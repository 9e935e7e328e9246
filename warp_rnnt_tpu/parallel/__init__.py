from warp_rnnt_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
from warp_rnnt_tpu.parallel.loss_parallel import (
    rnnt_loss_shard_map,
    rnnt_loss_sharded,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "shard_batch",
    "rnnt_loss_shard_map",
    "rnnt_loss_sharded",
]
