"""Device-mesh sharding of the stabilization pipeline.

The reference is single-process/single-node (SURVEY.md §2.5: no NCCL, no
MPI, no sockets); its only cross-task parallelism is a CPU thread pool over
hyperparameter combos. The TPU-native scale-out path is SPMD:

- the *stream* axis of a (S, T, H, W, C) batch is sharded over a 1-D mesh
  axis "streams"; every stream's pipeline is independent, so XLA emits zero
  collectives and scaling is embarrassingly linear over ICI-connected chips;
- hyperparameter sweeps vmap the dynamic parameters and shard the combo
  axis the same way (see apps/grid_search_align.py).

Multi-host note: keep streams sharded within an ICI domain; only whole
streams ever cross DCN (as input data), never activations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_stabilizer_tpu.config import StabilizerParams
from video_stabilizer_tpu.models.batch import stabilize_clip_impl

STREAM_AXIS = "streams"


def make_mesh(devices=None, axis_name: str = STREAM_AXIS) -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_streams(batch, mesh: Mesh, axis_name: str = STREAM_AXIS):
    """Place a (S, ...) array with S sharded over the mesh axis."""
    spec = P(axis_name, *([None] * (batch.ndim - 1)))
    return jax.device_put(batch, NamedSharding(mesh, spec))


@functools.partial(jax.jit, static_argnames=("params", "width", "height",
                                             "mesh", "axis_name"))
def _stabilize_sharded_jit(frames, params, width, height, mesh, axis_name):
    spec_in = P(axis_name, None, None, None, None)
    frames = jax.lax.with_sharding_constraint(
        frames, NamedSharding(mesh, spec_in))
    out, meas, ok = jax.vmap(
        lambda f: stabilize_clip_impl(f, params, width, height))(frames)
    return out, meas, ok


def stabilize_streams_sharded(frames_bgr, mesh: Mesh,
                              params: StabilizerParams = StabilizerParams(),
                              axis_name: str = STREAM_AXIS):
    """Stabilize (S, T, H, W, 3) u8 with S sharded over ``mesh``.

    S must be divisible by the mesh size. Returns (stabilized, measurements,
    success) with the same stream sharding on the outputs.
    """
    frames_bgr = jnp.asarray(frames_bgr)
    s = frames_bgr.shape[0]
    n_dev = mesh.devices.size
    if s % n_dev:
        raise ValueError(f"stream count {s} not divisible by mesh size {n_dev}")
    h, w = frames_bgr.shape[2], frames_bgr.shape[3]
    frames_bgr = shard_streams(frames_bgr, mesh, axis_name)
    return _stabilize_sharded_jit(frames_bgr, params, w, h, mesh, axis_name)
