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
from video_stabilizer_tpu.models.chunked import (
    _model_ops,
    init_stream_state,
    stabilize_chunk_core,
)

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
    # shard_map (not GSPMD vmap partitioning): under GSPMD, the vmapped GN
    # while_loops' batched conditions lower to scalar pred all-reduces —
    # every device then iterates until the globally slowest stream
    # converges (4 cross-device sync points per program, found by the
    # zero-collective HLO pin, tests/test_sharding.py). shard_map runs each
    # device's local streams as an independent program: local loop
    # conditions, zero collectives by construction. check_vma=False for the
    # same reason as the chunked path below (while_loop carries initialized
    # from replicated constants).
    def local(f):
        return jax.vmap(
            lambda f_: stabilize_clip_impl(f_, params, width, height))(f)

    spec = P(axis_name)
    return jax.shard_map(local, mesh=mesh, in_specs=(spec,),
                         out_specs=(spec, spec, spec),
                         check_vma=False)(frames)


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


# --------------------------------------------------------------------------
# Sharded CHUNKED serving: the unbounded-stream mode (models/chunked.py)
# over a device mesh. StreamState shards with its streams and stays
# device-resident (and sharded) across chunks; zero collectives by
# construction — each device runs its local streams' full chunk program,
# including the Pallas output warp, under shard_map.
# --------------------------------------------------------------------------

def init_sharded_stream_states(n_streams: int, width: int, height: int,
                               params: StabilizerParams, mesh: Mesh,
                               channels: int = 3, model: str = "similarity",
                               axis_name: str = STREAM_AXIS):
    """An (S,)-batched StreamState pytree with every leaf's leading stream
    axis sharded over ``mesh``. The serving contract this mirrors is the
    reference's unbounded one-frame-at-a-time loop (stabilizer.cpp:9-117),
    scaled out over independent streams."""
    n_dev = mesh.devices.size
    if n_streams % n_dev:
        raise ValueError(
            f"stream count {n_streams} not divisible by mesh size {n_dev}")
    state = init_stream_state(width, height, params, channels, model)
    return jax.tree.map(
        lambda x: jax.device_put(
            jnp.broadcast_to(x, (n_streams,) + x.shape),
            NamedSharding(mesh, P(axis_name, *([None] * x.ndim)))),
        state)


@functools.partial(jax.jit,
                   static_argnames=("params", "width", "height", "model",
                                    "mesh", "axis_name"),
                   donate_argnums=(0,))
def _stabilize_chunk_streams_sharded_jit(states, frames, params, width,
                                         height, model, mesh, axis_name):
    ops = _model_ops(model)

    def local(st, f):
        new_states, delayed, accums, meas, succ, valid = jax.vmap(
            lambda s_, f_: stabilize_chunk_core(s_, f_, params, width,
                                                height, model))(st, f)
        out = ops["warp"](delayed, accums, params, width, height)
        return new_states, out, meas, succ, valid

    spec = P(axis_name)
    # check_vma=False: the program is per-shard independent (no collectives),
    # and the varying-axes type check rejects while_loop carries initialized
    # from replicated constants (the GN loop's identity transform).
    return jax.shard_map(local, mesh=mesh, in_specs=(spec, spec),
                         out_specs=(spec, spec, spec, spec, spec),
                         check_vma=False)(states, frames)


def stabilize_chunk_streams_sharded(states, frames_bgr, mesh: Mesh,
                                    params: StabilizerParams,
                                    model: str = "similarity",
                                    axis_name: str = STREAM_AXIS):
    """One serving step for S sharded unbounded streams: feed an even-length
    (S, Tc, H, W, C) u8 chunk per stream, carrying ``states`` (from
    ``init_sharded_stream_states`` or a previous call) across calls.

    Returns (new_states, out, meas, success, out_valid) — all sharded over
    the stream axis; per-stream semantics identical to the unsharded
    ``models.chunked.stabilize_chunk_impl`` (pinned by tests/test_sharding.py).
    """
    frames_bgr = jnp.asarray(frames_bgr)
    s = frames_bgr.shape[0]
    n_dev = mesh.devices.size
    if s % n_dev:
        raise ValueError(
            f"stream count {s} not divisible by mesh size {n_dev}")
    h, w = frames_bgr.shape[2], frames_bgr.shape[3]
    frames_bgr = shard_streams(frames_bgr, mesh, axis_name)
    return _stabilize_chunk_streams_sharded_jit(
        states, frames_bgr, params, w, h, model, mesh, axis_name)
