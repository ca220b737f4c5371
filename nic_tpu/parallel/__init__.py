from nic_tpu.parallel.mesh import (
    data_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)

__all__ = ["data_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]
