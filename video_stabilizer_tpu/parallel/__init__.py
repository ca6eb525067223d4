"""Multi-chip scaling: device-mesh sharding of stream batches and vmapped
hyperparameter sweeps (the reference's CPU thread pools, re-expressed as
SPMD over a jax.sharding.Mesh)."""

from video_stabilizer_tpu.parallel.mesh import (
    init_sharded_stream_states,
    make_mesh,
    shard_streams,
    stabilize_chunk_streams_sharded,
    stabilize_streams_sharded,
)
from video_stabilizer_tpu.parallel.multihost import (
    initialize_multihost,
    local_stream_slice,
    make_global_stream_batch,
    multihost_mesh,
)

__all__ = ["make_mesh", "shard_streams", "stabilize_streams_sharded",
           "init_sharded_stream_states", "stabilize_chunk_streams_sharded",
           "initialize_multihost", "local_stream_slice",
           "make_global_stream_batch", "multihost_mesh"]
