"""Device mesh + sharding (data-parallel SPMD)."""

from straps_tpu.parallel.mesh import (
    DATA_AXIS, initialize_distributed, make_mesh, batch_sharding,
    replicated_sharding, shard_batch, replicate,
)

__all__ = ["DATA_AXIS", "initialize_distributed", "make_mesh",
           "batch_sharding", "replicated_sharding", "shard_batch", "replicate"]
