from seqrec_tpu.parallel.mesh import (
    batch_sharding,
    host_global,
    put_global,
    index_payload_sharding,
    make_mesh,
    param_sharding,
    shard_batch,
    shard_params,
    stacked_batch_sharding,
    store_sharding,
)

__all__ = [
    "make_mesh",
    "put_global",
    "host_global",
    "param_sharding",
    "batch_sharding",
    "index_payload_sharding",
    "stacked_batch_sharding",
    "store_sharding",
    "shard_params",
    "shard_batch",
]
