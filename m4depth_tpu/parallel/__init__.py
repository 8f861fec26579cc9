from m4depth_tpu.parallel.serving import (
    FreshFrameStream,
    jit_sharded_stream,
    shard_stream_inputs,
    replicate_params,
    assert_collective_free,
)
from m4depth_tpu.parallel.mesh import (
    make_mesh,
    make_hybrid_mesh,
    distributed_init,
    data_axes,
    batch_sharding,
    replicated_sharding,
    shard_batch_pytree,
    host_shard_indices,
)

__all__ = [
    "FreshFrameStream",
    "jit_sharded_stream",
    "shard_stream_inputs",
    "replicate_params",
    "assert_collective_free",
    "make_mesh",
    "make_hybrid_mesh",
    "distributed_init",
    "data_axes",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch_pytree",
    "host_shard_indices",
]
