"""Multi-host scale-out recipe for the stream-sharded pipeline.

The reference is single-process (SURVEY.md §2.5); this framework's
single-host scale-out shards independent streams over a 1-D ICI mesh with
zero collectives (parallel/mesh.py). Across HOSTS the same program shape
holds — the stream axis is still embarrassingly parallel — but three
things change, encoded here:

1. **Process bring-up**: `jax.distributed.initialize` before any device
   query; every process then sees the global device set and runs the SAME
   jitted program (SPMD).
2. **Data ingest locality**: each host feeds ONLY the streams whose shards
   live on its local devices (`make_global_stream_batch` builds the global
   jax.Array from per-host local frames via
   `jax.make_array_from_single_device_arrays`) — whole input streams are
   the only thing that ever crosses DCN, never activations or carried
   state (the chunked StreamState shards with its streams and stays
   device-resident between chunks).
3. **Topology**: keep the mesh axis ordered so each host's stream shards
   map to its local chips (the default `jax.devices()` order does this);
   collective-free programs then never touch ICI either.

This module is exercised in single-process form by the test suite (the
virtual 8-device mesh); `initialize_multihost` is a no-op there. On a real
multi-host slice, launch one process per host with the standard
coordinator environment (JAX_COORDINATOR_ADDRESS etc.) or explicit
arguments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_stabilizer_tpu.parallel.mesh import STREAM_AXIS, make_mesh


# Set after a successful jax.distributed.initialize() by THIS module:
# double-initialization must be detected without a backend-initializing
# query (jax.process_count() would bring up the backend too early) and
# without parsing exception text (brittle across JAX versions — advisor
# round-3 finding).
_initialized = False


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Bring up jax.distributed when running multi-process; no-op when the
    environment provides no coordinator (single-process dev/test).

    Must run before ANY backend-initializing jax call — including
    jax.process_count(), which is why the no-coordinator check comes first
    and idempotence is tracked with a module flag rather than by querying
    process_count() (found by the two-process smoke test,
    apps/multihost_smoke.py)."""
    import os

    global _initialized
    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return  # single-process
    if _initialized:
        return  # idempotent: a second call is a no-op
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True


def local_stream_slice(total_streams: int) -> slice:
    """The half-open range of global stream indices this host must feed
    (streams are block-sharded over the global device order)."""
    n_proc = jax.process_count()
    per = total_streams // n_proc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def make_global_stream_batch(local_frames, mesh: Mesh,
                             total_streams: int,
                             axis_name: str = STREAM_AXIS):
    """Assemble the global (S_total, T, H, W, C) jax.Array from this host's
    LOCAL streams (S_local = S_total / process_count), placing each local
    stream shard on the corresponding local device. Only input pixels move;
    they move once, host -> its own chips.
    """
    local_frames = np.asarray(local_frames)
    s_local = local_frames.shape[0]
    local_devices = [d for d in mesh.devices.flat
                     if d.process_index == jax.process_index()]
    if s_local % len(local_devices):
        raise ValueError(
            f"local stream count {s_local} not divisible by "
            f"{len(local_devices)} local devices")
    per_dev = s_local // len(local_devices)
    spec = P(axis_name, *([None] * (local_frames.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    global_shape = (total_streams,) + local_frames.shape[1:]
    shards = [
        jax.device_put(local_frames[k * per_dev:(k + 1) * per_dev], dev)
        for k, dev in enumerate(local_devices)
    ]
    return jax.make_array_from_single_device_arrays(global_shape, sharding,
                                                    shards)


def multihost_mesh(axis_name: str = STREAM_AXIS) -> Mesh:
    """A 1-D mesh over ALL processes' devices (global device order keeps
    each host's shards on its local chips)."""
    return make_mesh(jax.devices(), axis_name)
