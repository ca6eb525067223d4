"""Chunked streaming-batch stabilization: unbounded streams at batch speed.

The reference stabilizes arbitrarily long videos one frame at a time
(stabilizer.cpp:9-117) at streaming latency; the batched pipeline
(models/batch.py) runs at full device throughput but only on finite clips
that fit in memory. This module closes the gap: a fixed-size ``StreamState``
pytree carries everything the pipeline needs across successive T-frame
chunks —

  - the aligner's keyframe carry (_PairCarry: keyframe pyramid + precompute)
    and the global pair counter (warm-up masking),
  - the trailing ``lag + smoother_memory`` measurements (the smoother's
    look-behind window plus the accumulator's lag delay),
  - the running accumulated correction (4,),
  - the trailing ``lag`` input frames (each output warps the frame ``lag``
    steps behind the newest measurement, stabilizer.cpp:48-56),

so feeding chunks through ``stabilize_chunk`` reproduces the unchunked
``stabilize_clip_impl`` outputs exactly (pinned by tests/test_chunked.py)
while every input frame eventually receives exactly one output warp — the
honest 1-warp-per-frame serving accounting.

Index bookkeeping (all offsets static at trace time): with ``steps_seen``
frames consumed before this chunk, local step j is global step
i = steps_seen + j. The fold at step i pops measurement m = i - lag and
pairs it with smoothed[m + lag - memory] (the replicated reference quirk,
SURVEY.md §3.1); within the carried-tail + chunk measurement array,
measurement g sits at position g - steps_seen + lag + memory, so m is at
the static position j + memory and the smoothing window for output j starts
at position max(0, ...) >= j.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from video_stabilizer_tpu import transforms as T
from video_stabilizer_tpu.config import StabilizerParams
from video_stabilizer_tpu.models.aligner import level_specs
from video_stabilizer_tpu.models.batch import (
    _PairCarry,
    _align_pairs_scan,
    _bgr_to_gray_batched,
    init_pair_carry,
    warp_delayed,
)
from video_stabilizer_tpu.models.smoother import tvl1_smooth


def _model_ops(model: str):
    """The family-specific pieces of the chunked pipeline: both motion
    models share the exact event-order/state machinery, differing only in
    parameter count, group algebra, pair-scan, and output warp."""
    if model == "similarity":
        return dict(nparams=4, compose=T.compose, inverse=T.inverse,
                    mcd=T.max_corner_displacement,
                    init_carry=init_pair_carry,
                    align_scan=_align_pairs_scan,
                    warp=warp_delayed)
    if model == "homography":
        from video_stabilizer_tpu import homography as Hm
        from video_stabilizer_tpu.models.homography_aligner import (
            _align_pairs_scan_h, init_pair_carry_h, warp_delayed_homography)
        return dict(nparams=8, compose=Hm.compose, inverse=Hm.inverse,
                    mcd=Hm.max_corner_displacement,
                    init_carry=init_pair_carry_h,
                    align_scan=_align_pairs_scan_h,
                    warp=warp_delayed_homography)
    raise ValueError(f"unknown motion model {model!r}")


class StreamState(NamedTuple):
    """Fixed-size carried state of one stabilization stream."""
    pair: _PairCarry        # aligner keyframe carry
    pairs_seen: jnp.ndarray  # () int32 — global pair counter
    meas_tail: jnp.ndarray   # (lag + memory, 4) trailing measurements
    accum: jnp.ndarray       # (4,) accumulated correction
    frame_tail: jnp.ndarray  # (lag, H, W, C) trailing input frames
    steps_seen: jnp.ndarray  # () int32 — global frames consumed


def init_stream_state(width: int, height: int, params: StabilizerParams,
                      channels: int = 3,
                      model: str = "similarity") -> StreamState:
    """The pre-stream state (zero history)."""
    ops = _model_ops(model)
    specs = level_specs(width, height, params.aligner)
    dtype = jnp.dtype(params.aligner.dtype)
    tail = params.lag + params.smoother_memory
    shape = ((params.lag, height, width, channels) if channels
             else (params.lag, height, width))
    return StreamState(
        pair=ops["init_carry"](specs, params.aligner),
        pairs_seen=jnp.zeros((), jnp.int32),
        meas_tail=jnp.zeros((tail, ops["nparams"]), dtype),
        accum=jnp.zeros((ops["nparams"],), dtype),
        frame_tail=jnp.zeros(shape, jnp.uint8),
        steps_seen=jnp.zeros((), jnp.int32),
    )


def _chunk_smoothed(full_meas, steps_seen, tc, params: StabilizerParams):
    """The smoothed transform paired with each of the chunk's folds.

    Output j needs smoothed[sm_g] with sm_g = steps_seen + j - memory
    (= m + lag - memory for m = steps_seen + j - lag). Window semantics
    replicate smooth_trajectory / smoother.cpp:91-113: smooth measurements
    [max(0, sm_g - lag), sm_g + memory], take element sm_g.
    """
    lag = params.lag
    memory = params.smoother_memory
    tail_len = lag + memory
    window = tail_len + 1
    m_total = full_meas.shape[0]

    js = jnp.arange(tc, dtype=jnp.int32)
    sm_g = steps_seen + js - memory
    start_g = jnp.maximum(0, sm_g - lag)
    pos_start = start_g - steps_seen + tail_len     # >= 0 by construction
    offs = jnp.arange(window, dtype=jnp.int32)
    gather_idx = jnp.clip(pos_start[:, None] + offs[None, :], 0, m_total - 1)
    windows = full_meas[gather_idx]                 # (tc, window, 4)
    middle = jnp.maximum(sm_g - start_g, 0)
    valid = sm_g + memory - start_g + 1

    def smooth_one(win, mid, vlen):
        sm = tvl1_smooth(win.T, jnp.asarray(params.lambda_, win.dtype),
                         valid_len=vlen)            # (4, window)
        return jax.lax.dynamic_slice_in_dim(sm, mid, 1, axis=-1)[:, 0]

    return jax.vmap(smooth_one)(windows, middle, valid)


def stabilize_chunk_core(state: StreamState, frames_bgr,
                         params: StabilizerParams, width: int, height: int,
                         model: str = "similarity"):
    """One chunk, everything up to (but excluding) the output warp.

    Returns (new_state, delayed (Tc, H, W, C), accums (Tc, P), meas,
    success, out_valid). Warp-free so the stream pipeline can vmap this
    part and run the Pallas warp once over the whole (S, Tc) batch.
    """
    ops = _model_ops(model)
    tc = frames_bgr.shape[0]
    if tc % 2:
        raise ValueError(f"chunk length {tc} must be even (the aligner "
                         "consumes frames in keyframe pairs)")
    lag = params.lag
    memory = params.smoother_memory
    tail_len = lag + memory
    specs = level_specs(width, height, params.aligner)

    gray = _bgr_to_gray_batched(frames_bgr)
    pair_carry, meas_c, succ_c = ops["align_scan"](
        gray, specs, params.aligner, None, state.pair, state.pairs_seen)

    full_meas = jnp.concatenate([state.meas_tail, meas_c], axis=0)
    if params.enable_smoother:
        smoothed_j = _chunk_smoothed(full_meas, state.steps_seen, tc, params)
    else:
        smoothed_j = jnp.zeros((tc, ops["nparams"]), meas_c.dtype)

    # The accumulator scan (stabilizer.cpp:32-88), same event order as
    # batch.accumulate_corrections: reset on the CURRENT step's alignment
    # failure, then fold measurement m = i - lag when it exists.
    dtype = meas_c.dtype
    min_disp = jnp.asarray(params.min_disp, dtype)
    max_disp = jnp.asarray(params.max_disp, dtype)
    min_decay = jnp.asarray(params.min_decay, dtype)
    max_decay = jnp.asarray(params.max_decay, dtype)
    meas_m = full_meas[memory:memory + tc]          # measurement m per step
    js = jnp.arange(tc, dtype=jnp.int32)
    m_valid = state.steps_seen + js - lag >= 0

    def step(accum, inputs):
        succ_j, meas, sm, valid = inputs
        accum = jnp.where(succ_j, accum, jnp.zeros(ops["nparams"], dtype))

        def fold(a):
            if params.enable_smoother:
                jitter = ops["compose"](meas, ops["inverse"](sm))
            else:
                jitter = meas
            new = ops["compose"](a, jitter)
            disp = ops["mcd"](new, width, height)
            f = jnp.clip((disp - min_disp) / (max_disp - min_disp), 0.0, 1.0)
            decay = jnp.where(
                disp > max_disp, max_decay,
                jnp.where(disp > min_disp,
                          min_decay * (1.0 - f) + max_decay * f, min_decay))
            return new * decay

        accum = jnp.where(valid, fold(accum), accum)
        return accum, accum

    accum_final, accums = jax.lax.scan(
        step, state.accum, (succ_c, meas_m, smoothed_j, m_valid))

    # Output j warps the frame lag steps behind: global frame i - lag, which
    # is position j of [carried frame tail | chunk frames].
    all_frames = jnp.concatenate([state.frame_tail, frames_bgr], axis=0)
    delayed = all_frames[:tc]

    new_state = StreamState(
        pair=pair_carry,
        pairs_seen=state.pairs_seen + tc // 2,
        meas_tail=full_meas[-tail_len:],
        accum=accum_final,
        frame_tail=all_frames[tc:],
        steps_seen=state.steps_seen + tc,
    )
    return new_state, delayed, accums, meas_c, succ_c, m_valid


def stabilize_chunk_impl(state: StreamState, frames_bgr,
                         params: StabilizerParams, width: int, height: int,
                         model: str = "similarity"):
    """Stabilize one even-length chunk, carrying state across calls.

    Returns (new_state, out (Tc, H-2c, W-2c, C) u8, meas (Tc, P),
    success (Tc,), out_valid (Tc,)): ``out_valid[j]`` is False for the
    first ``lag`` outputs of a fresh stream (no frame to warp yet —
    the streaming path returns None there, stabilizer.cpp:44-46).
    """
    ops = _model_ops(model)
    new_state, delayed, accums, meas_c, succ_c, m_valid = (
        stabilize_chunk_core(state, frames_bgr, params, width, height,
                             model))
    stabilized = ops["warp"](delayed, accums, params, width, height)
    return new_state, stabilized, meas_c, succ_c, m_valid


@functools.partial(jax.jit,
                   static_argnames=("params", "width", "height", "model"),
                   donate_argnums=(0,))
def _stabilize_chunk_jit(state, frames, params, width, height,
                         model="similarity"):
    return stabilize_chunk_impl(state, frames, params, width, height, model)


@functools.partial(jax.jit,
                   static_argnames=("params", "width", "height", "model"),
                   donate_argnums=(0,))
def _stabilize_chunk_streams_jit(states, frames, params, width, height,
                                 model="similarity"):
    # Core under vmap; the warp hoisted out so the Pallas kernel sees the
    # whole (S, Tc) batch in one call (its grid IS the batch axis).
    ops = _model_ops(model)
    new_states, delayed, accums, meas, succ, valid = jax.vmap(
        lambda st, f: stabilize_chunk_core(st, f, params, width, height,
                                           model)
    )(states, frames)
    out = ops["warp"](delayed, accums, params, width, height)
    return new_states, out, meas, succ, valid


class ChunkedStabilizer:
    """Stateful host wrapper: feed even-length chunks of (T, H, W, 3) u8
    frames; each call returns the stabilized outputs that became valid
    (one per input frame once the initial ``lag`` delay is filled).
    ``model`` selects the 4-DOF similarity (reference parity) or the
    8-DOF homography family."""

    def __init__(self, params: StabilizerParams = StabilizerParams(),
                 model: str = "similarity"):
        self.params = params
        self.model = model
        self._state = None
        self._shape = None

    def process_chunk(self, frames_bgr):
        frames_bgr = jnp.asarray(frames_bgr)
        h, w = frames_bgr.shape[1], frames_bgr.shape[2]
        ch = frames_bgr.shape[3] if frames_bgr.ndim == 4 else 0
        if self._state is None or self._shape != (h, w, ch):
            self._state = init_stream_state(w, h, self.params, ch,
                                            self.model)
            self._shape = (h, w, ch)
        self._state, out, meas, succ, valid = _stabilize_chunk_jit(
            self._state, frames_bgr, self.params, w, h, self.model)
        valid = jax.device_get(valid)
        return out[jnp.asarray(valid.nonzero()[0])], meas, succ


def stabilize_stream_chunked(frames_bgr, params: StabilizerParams,
                             chunk_size: int, model: str = "similarity"):
    """Stabilize an arbitrarily long (T, H, W, C) u8 stream in
    ``chunk_size``-frame device chunks (T and chunk_size even,
    chunk_size >= 2). Returns (stabilized (T - lag, ...), meas (T, P),
    success (T,)) — identical to ``stabilize_clip_impl`` /
    ``stabilize_clip_homography_impl`` on the same frames
    (see tests/test_chunked.py).
    """
    import numpy as np

    frames_bgr = jnp.asarray(frames_bgr)
    t_total = frames_bgr.shape[0]
    if t_total % chunk_size:
        raise ValueError(f"stream length {t_total} must be a multiple of "
                         f"chunk_size {chunk_size}")
    h, w = frames_bgr.shape[1], frames_bgr.shape[2]
    ch = frames_bgr.shape[3] if frames_bgr.ndim == 4 else 0
    state = init_stream_state(w, h, params, ch, model)
    outs, meas_all, succ_all = [], [], []
    for start in range(0, t_total, chunk_size):
        chunk = frames_bgr[start:start + chunk_size]
        state, out, meas, succ, valid = _stabilize_chunk_jit(
            state, chunk, params, w, h, model)
        valid = np.asarray(valid)
        outs.append(np.asarray(out)[valid])
        meas_all.append(np.asarray(meas))
        succ_all.append(np.asarray(succ))
    return (np.concatenate(outs, axis=0), np.concatenate(meas_all, axis=0),
            np.concatenate(succ_all, axis=0))
