"""Batched, device-resident stabilization pipelines.

The throughput-oriented mode the reference never had: whole clips (and
batches of streams) stabilized in one XLA program — ``lax.scan`` over time,
``vmap``/``pjit`` over streams. This is the flagship serving path for the
">500 fps 1080p on one v5e" target and the unit that shards over a device
mesh (see parallel/mesh.py).

Key structural idea: the reference's alternating keyframe (alignment.hpp:
61-66) makes keyframe precompute run on every *other* frame. A naive
``lax.cond`` under ``vmap`` would execute both branches every frame; instead
the scan consumes frames in PAIRS — (non-keyframe, keyframe) — so the branch
structure is static inside each scan step: exactly one keyframe precompute
and two aligns per two frames, the same op count as the reference.

Semantics (measurements, smoother pairing offset, decay, warp) replicate the
streaming VideoStabilizer bit-for-bit in f32 — see test_batch.py for the
streaming-vs-batched equivalence test.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from video_stabilizer_tpu import transforms as T
from video_stabilizer_tpu.config import (
    AlignerParams, StabilizerParams, resolve_residual_bound)
from video_stabilizer_tpu.models.aligner import (
    PHASE_LEVEL,
    _compute_keyframe,
    _gn_level_uses_pallas,
    align_all_levels,
    level_specs,
    phase_init_pair,
)
from video_stabilizer_tpu.models.smoother import tvl1_smooth
from video_stabilizer_tpu.ops import build_pyramid
from video_stabilizer_tpu.ops.fast_warp import warp_image_fast


def _warp_mode(params: StabilizerParams) -> str:
    mode = params.output_warp
    if mode == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "fir"
    return mode


def output_warp(frame, t_sample_ul, params: StabilizerParams,
                width: int, height: int):
    """The output-stage warp kernel for ONE frame, selected by
    params.output_warp: Pallas tile-local-base kernel on real TPU backends
    ("auto"/"pallas"), XLA shifted-slice FIR otherwise. Both pinned to the
    exact gather oracle (tests/test_pallas_warp.py,
    tests/test_fast_warp_oracle.py)."""
    if _warp_mode(params) == "pallas":
        from video_stabilizer_tpu.ops.pallas_warp import warp_image_pallas
        return warp_image_pallas(frame, t_sample_ul,
                                 interp=params.output_interp)
    return warp_image_fast(frame, t_sample_ul, interp=params.output_interp,
                           residual_bound=resolve_residual_bound(
                               params, width, height))


def warp_delayed(delayed, accums, params: StabilizerParams,
                 width: int, height: int):
    """Warp + crop a batch of delayed frames by their accumulated
    corrections. ``delayed``: (..., H, W, C) u8, ``accums``: (..., 4).

    The Pallas kernel takes the whole batch in ONE call (leading axes fold
    into its grid — Pallas ANY-space operands cannot live under vmap, so
    the stream pipelines hoist this stage out of their stream-vmap); the
    FIR path maps sequentially over frames to bound its ~30 MB/frame of
    f32 intermediates.
    """
    t_ul = T.center_to_ul(accums.astype(jnp.float32), width, height,
                          minus_one=True)
    c = params.crop_pixels
    squeeze = delayed.shape[-1] != 3       # grayscale stream: no channel axis
    if squeeze:
        delayed = delayed[..., None]
    if _warp_mode(params) == "pallas":
        from video_stabilizer_tpu.ops.pallas_warp import warp_frames_pallas
        out = warp_frames_pallas(delayed, t_ul, interp=params.output_interp)
    else:
        batch_shape = delayed.shape[:-3]
        flat_frames = delayed.reshape((-1,) + delayed.shape[-3:])
        flat_t = t_ul.reshape(-1, 4)
        rb = resolve_residual_bound(params, width, height)
        out = jax.lax.map(
            lambda args: warp_image_fast(args[0], args[1],
                                         interp=params.output_interp,
                                         residual_bound=rb),
            (flat_frames, flat_t))
        out = out.reshape(batch_shape + out.shape[1:])
    if c > 0:
        out = out[..., c:-c, c:-c, :]
    return out[..., 0] if squeeze else out


class _PairCarry(NamedTuple):
    key_pyr: tuple   # per-level (h, w) u8 keyframe images
    key: tuple       # per-level LevelKeyData


def pair_lanes_vmap_ok(specs, params: AlignerParams) -> bool:
    """May the pair step run its two independent alignments as one 2-lane
    vmap (AlignerParams.pair_vmap)? Static per trace. Falls back to
    sequential aligns for the Pallas in-VMEM GN kernel (lane+stream nested
    vmap unvalidated on hardware) and for the merged coarse-level loop
    (its level-walker carry has no lane masking)."""
    if not params.pair_vmap or params.merge_coarse >= 2:
        return False
    from video_stabilizer_tpu.ops.patches import window_size
    return not any(
        _gn_level_uses_pallas(params, window_size(s.tile, s.margin),
                              s.ht * s.wt)
        for s in specs)


def _align_pair_step(carry: _PairCarry, xs, specs, params: AlignerParams,
                     dyn=None):
    """One scan step = two input frames (alignment.cpp frame indices 2k,
    2k+1): frame_a lands in the non-keyframe buffer (aligned against the
    previous keyframe, result inverted — alignment.cpp:690-693); frame_b
    becomes the new keyframe (precompute + align, direct)."""
    frame_a, frame_b, pair_idx = xs
    # BGR frames convert to gray here, inside the scan: converting the whole
    # clip upfront materializes a T x H x W x 3 f32 blob (3 GB at 8x32x1080p,
    # ~21 ms — measured); per-pair conversion keeps it at 2 frames.
    frame_a = _bgr_to_gray_batched(frame_a)
    frame_b = _bgr_to_gray_batched(frame_b)
    dtype = jnp.dtype(params.dtype)
    num_levels = len(specs)

    lvl_p = min(PHASE_LEVEL, num_levels - 1)
    pyr_a = tuple(build_pyramid(frame_a, num_levels))
    pyr_b = tuple(build_pyramid(frame_b, num_levels))
    key_b = _compute_keyframe(pyr_b, specs, params)
    # frame_a (non-keyframe): template = itself, keyframe = carried (the
    # previous frame, which is also the phase-correlation's 'prev').
    # frame_b (keyframe): template = frame_a's pyramid, keyframe = itself.
    if params.phase_correlate:
        t0_a = phase_init_pair(carry.key_pyr[lvl_p], pyr_a[lvl_p],
                               num_levels, params, dtype, False)
        t0_b = phase_init_pair(pyr_a[lvl_p], pyr_b[lvl_p],
                               num_levels, params, dtype, True)
    else:
        t0_a = T.identity(dtype)
        t0_b = T.identity(dtype)

    if pair_lanes_vmap_ok(specs, params):
        # The two alignments share no data (both read template pyr_a, each
        # against its own keyframe windows), so run them as ONE 2-lane
        # vmapped align program: the per-level GN while_loops — already
        # lane-masked under the stream vmap — serve both lanes per
        # iteration, halving the sequential loop programs per pair (the
        # launch-bound "GN fusion soup", BASELINE.md 4K profile).
        key2 = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                            carry.key, key_b)
        t2, failed2 = jax.vmap(
            lambda k, t0: align_all_levels(pyr_a, k, specs, params, t0,
                                           dyn))(key2,
                                                 jnp.stack([t0_a, t0_b]))
        t_a, failed_a = t2[0], failed2[0]
        t_b, failed_b = t2[1], failed2[1]
    else:
        t_a, failed_a = align_all_levels(pyr_a, carry.key, specs,
                                         params, t0_a, dyn)
        t_b, failed_b = align_all_levels(pyr_a, key_b, specs, params,
                                         t0_b, dyn)

    t_a = jnp.where(failed_a, t_a, T.inverse(t_a))
    ok_a = jnp.logical_and(pair_idx > 0, jnp.logical_not(failed_a))
    t_a = jnp.where(pair_idx > 0, t_a, T.identity(dtype))
    ok_b = jnp.logical_not(failed_b)

    new_carry = _PairCarry(key_pyr=pyr_b, key=key_b)
    return new_carry, (jnp.stack([t_a, t_b]),
                       jnp.stack([ok_a, ok_b]))


def init_pair_carry(specs, params: AlignerParams) -> _PairCarry:
    """The zero pre-stream aligner carry (no keyframe seen yet)."""
    zero_pyr = tuple(
        jnp.zeros((s.height, s.width), jnp.uint8) for s in specs)
    return _PairCarry(key_pyr=zero_pyr,
                      key=_compute_keyframe(zero_pyr, specs, params))


def _align_pairs_scan(frames, specs, params: AlignerParams, dyn,
                      carry0: _PairCarry, pair_base):
    """Scan ``_align_pair_step`` over an even-length frame sequence starting
    from an arbitrary carried keyframe state. ``pair_base`` is the global
    index of the first pair (0 only at true stream start — it gates the
    first frame's warm-up masking).

    Returns (final_carry, transforms (T, 4), success (T,))."""
    t_pad = frames.shape[0]
    assert t_pad % 2 == 0
    pairs_a = frames[0::2]
    pairs_b = frames[1::2]
    idx = pair_base + jnp.arange(t_pad // 2, dtype=jnp.int32)
    step = functools.partial(_align_pair_step, specs=specs, params=params,
                             dyn=dyn)
    carry, (t_pairs, ok_pairs) = jax.lax.scan(step, carry0,
                                              (pairs_a, pairs_b, idx))
    return carry, t_pairs.reshape(t_pad, 4), ok_pairs.reshape(t_pad)


def align_clip_impl(frames, params: AlignerParams, width: int, height: int,
                    dyn=None):
    """Align a whole (T, H, W) gray or (T, H, W, 3) BGR u8 clip on device.

    Returns (transforms (T, 4), success (T,) bool): per-frame motion from
    the previous frame, first frame reported unsuccessful like the
    streaming path. Odd-length clips are padded internally and trimmed.
    """
    specs = level_specs(width, height, params)
    t_in = frames.shape[0]
    if t_in % 2:
        frames = jnp.concatenate([frames, frames[-1:]], axis=0)
    carry0 = init_pair_carry(specs, params)
    _, transforms_seq, success = _align_pairs_scan(
        frames, specs, params, dyn, carry0, jnp.zeros((), jnp.int32))
    return transforms_seq[:t_in], success[:t_in]


@functools.partial(jax.jit, static_argnames=("params", "width", "height"))
def _align_clip_jit(frames, params, width, height):
    return align_clip_impl(frames, params, width, height)


def align_clip(frames, params: AlignerParams = AlignerParams()):
    """Host-friendly wrapper: (T, H, W) u8 -> (transforms, success)."""
    t, h, w = frames.shape
    return _align_clip_jit(jnp.asarray(frames), params, w, h)


# --------------------------------------------------------------------------
# Trajectory smoothing + jitter accumulation + output warp, all on device.
# --------------------------------------------------------------------------

def smooth_trajectory(measurements, params: StabilizerParams):
    """Sliding-window TV-L1 smooth of a (T, 4) measurement sequence.

    Replicates L1SmootherCenter's per-update windows (smoother.cpp:91-113):
    output k smooths [max(0, k - lag), k + memory] and takes the element at
    index k. Every window runs in parallel (vmapped) instead of the
    reference's sequential re-smoothing per frame.

    Returns (T_s, 4) with T_s = T - smoother_memory (indices with a full
    look-ahead window).
    """
    t_total = measurements.shape[0]
    lag_behind = params.lag
    lag_ahead = params.smoother_memory
    window = lag_behind + lag_ahead + 1
    n_out = t_total - lag_ahead
    if n_out <= 0:
        return jnp.zeros((0, measurements.shape[-1]), measurements.dtype)

    ks = jnp.arange(n_out, dtype=jnp.int32)
    starts = jnp.maximum(0, ks - lag_behind)
    valid = ks + lag_ahead - starts + 1          # window length per k
    # Gather fixed-size windows starting at `starts` (rows beyond the valid
    # prefix are ignored via valid_len).
    offs = jnp.arange(window, dtype=jnp.int32)
    gather_idx = jnp.minimum(starts[:, None] + offs[None, :], t_total - 1)
    windows = measurements[gather_idx]           # (n_out, window, 4)

    def smooth_one(win, k, start, vlen):
        sm = tvl1_smooth(win.T, jnp.asarray(params.lambda_, win.dtype),
                         valid_len=vlen)         # (4, window)
        middle = k - start
        return jax.lax.dynamic_slice_in_dim(sm, middle, 1, axis=-1)[:, 0]

    return jax.vmap(smooth_one)(windows, ks, starts, valid)


def accumulate_corrections(measurements, success, smoothed,
                           params: StabilizerParams, width: int, height: int):
    """The stabilizer's per-frame accumulator scan (stabilizer.cpp:32-88).

    Follows the streaming event order exactly: at input step i, an alignment
    failure resets the accumulator; when i >= lag, measurement m = i - lag
    is popped, jitter = meas[m] ∘ smoothed[m + lag - memory]^-1 is folded in
    with displacement-based decay.

    Returns (T - lag, 4): the accumulated correction for each output frame.
    """
    t_total = measurements.shape[0]
    lag = params.lag
    offset = lag - params.smoother_memory  # the replicated pairing quirk
    n_out = t_total - lag
    dtype = measurements.dtype

    min_disp = jnp.asarray(params.min_disp, dtype)
    max_disp = jnp.asarray(params.max_disp, dtype)
    min_decay = jnp.asarray(params.min_decay, dtype)
    max_decay = jnp.asarray(params.max_decay, dtype)

    def step(accum, i):
        accum = jnp.where(success[i], accum, jnp.zeros(4, dtype))
        m = i - lag

        def fold(accum):
            meas = measurements[m]
            if params.enable_smoother:
                sm = smoothed[jnp.minimum(m + offset, smoothed.shape[0] - 1)]
                jitter = T.compose(meas, T.inverse(sm))
            else:
                jitter = meas
            # newAccum = m_accum.compose(jitter): apply accum first, then
            # jitter (stabilizer.cpp:66).
            new_accum = T.compose(accum, jitter)
            disp = T.max_corner_displacement(new_accum, width, height)
            f = jnp.clip((disp - min_disp) / (max_disp - min_disp), 0.0, 1.0)
            decay = jnp.where(
                disp > max_disp, max_decay,
                jnp.where(disp > min_disp,
                          min_decay * (1.0 - f) + max_decay * f, min_decay))
            return new_accum * decay

        accum = jnp.where(m >= 0, fold(accum), accum)
        return accum, accum

    _, accums = jax.lax.scan(step, jnp.zeros(4, dtype),
                             jnp.arange(t_total, dtype=jnp.int32))
    return accums[lag:]


def stabilize_clip_core(frames_bgr, params: StabilizerParams,
                        width: int, height: int):
    """Everything up to (but excluding) the output warp: align, smooth,
    accumulate. Returns (delayed frames (T - lag, ...), accums (T - lag, 4),
    meas (T, 4), success (T,)). Kept warp-free so the stream pipelines can
    vmap this part and run the Pallas warp ONCE over the whole batch."""
    if frames_bgr.shape[0] <= params.lag:
        raise ValueError(
            f"clip length {frames_bgr.shape[0]} must exceed lag={params.lag} "
            "to produce any output (the stabilizer delays by `lag` frames)")
    # Bulk upfront gray conversion: one big efficient kernel beats per-step
    # converts inside the scan by ~4% (measured both ways).
    gray = _bgr_to_gray_batched(frames_bgr)
    meas, success = align_clip_impl(gray, params.aligner, width, height)

    if params.enable_smoother:
        smoothed = smooth_trajectory(meas, params)
    else:
        smoothed = meas
    accums = accumulate_corrections(meas, success, smoothed, params,
                                    width, height)
    delayed = frames_bgr[: frames_bgr.shape[0] - params.lag]
    return delayed, accums, meas, success


def stabilize_clip_impl(frames_bgr, params: StabilizerParams,
                        width: int, height: int):
    """Full on-device stabilization of a (T, H, W, C) u8 clip.

    Returns (stabilized (T - lag, H - 2c, W - 2c, C) u8,
             transforms (T, 4), success (T,)).
    """
    delayed, accums, meas, success = stabilize_clip_core(
        frames_bgr, params, width, height)
    stabilized = warp_delayed(delayed, accums, params, width, height)
    return stabilized, meas, success


def _bgr_to_gray_batched(frames):
    # Convert iff a channel axis is present (works for single frames under
    # vmap and for (..., T, H, W, 3) batches alike).
    if frames.shape[-1] != 3:
        return frames
    from video_stabilizer_tpu.models.stabilizer import bgr_to_gray
    return bgr_to_gray(frames)


@functools.partial(jax.jit, static_argnames=("params", "width", "height"))
def _stabilize_clip_jit(frames, params, width, height):
    return stabilize_clip_impl(frames, params, width, height)


def stabilize_clip(frames_bgr, params: StabilizerParams = StabilizerParams()):
    """Host wrapper: (T, H, W, 3) or (T, H, W) u8 -> stabilized clip."""
    frames_bgr = jnp.asarray(frames_bgr)
    h, w = frames_bgr.shape[1], frames_bgr.shape[2]
    return _stabilize_clip_jit(frames_bgr, params, w, h)


@functools.partial(jax.jit, static_argnames=("params", "width", "height"))
def _stabilize_streams_jit(frames, params, width, height):
    # Core under vmap; the warp hoisted out so the Pallas kernel sees the
    # whole (S, T - lag) batch in one call (its grid IS the batch axis).
    delayed, accums, meas, success = jax.vmap(
        lambda f: stabilize_clip_core(f, params, width, height))(frames)
    out = warp_delayed(delayed, accums, params, width, height)
    return out, meas, success


def stabilize_streams(frames_bgr, params: StabilizerParams = StabilizerParams()):
    """Multi-stream batch: (S, T, H, W, 3) u8 -> (S, T - lag, ...) u8.

    vmapped over the stream axis; shard the input's S axis over a device
    mesh (parallel/mesh.py) to scale across chips with zero collectives.
    """
    frames_bgr = jnp.asarray(frames_bgr)
    h, w = frames_bgr.shape[2], frames_bgr.shape[3]
    return _stabilize_streams_jit(frames_bgr, params, w, h)
