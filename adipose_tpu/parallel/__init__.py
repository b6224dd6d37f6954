from adipose_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
    replicated_sharding,
)
from adipose_tpu.parallel.multihost import (
    initialize_multihost,
    make_global_mesh,
    local_batch_slice,
    make_global_array,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_sharding",
    "replicated_sharding",
    "initialize_multihost",
    "make_global_mesh",
    "local_batch_slice",
    "make_global_array",
]
