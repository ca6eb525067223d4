"""Batched pipeline tests: streaming-vs-batched equivalence, multi-stream
vmap, and window semantics of the vectorized smoother."""

import numpy as np
import jax.numpy as jnp

from video_stabilizer_tpu.config import AlignerParams, StabilizerParams
from video_stabilizer_tpu.models import VideoAligner, VideoStabilizer
from video_stabilizer_tpu.models.batch import (
    align_clip,
    smooth_trajectory,
    stabilize_clip,
    stabilize_streams,
)
from video_stabilizer_tpu.models.smoother import tvl1_smooth_np
from video_stabilizer_tpu.utils.io import synth_shaky_clip
from video_stabilizer_tpu.utils.jitter import median_jitter_px

H, W, N = 144, 192, 24


def gray_clip(seed=21, n=N):
    clip = synth_shaky_clip(n, H, W, seed=seed, jitter_px=0.8,
                            pan_px_per_frame=0.3, color=False)
    return clip


def test_align_clip_matches_streaming():
    clip = gray_clip()
    params = AlignerParams()
    t_batch, ok_batch = align_clip(clip, params)

    aligner = VideoAligner(params)
    t_stream, ok_stream = [], []
    for f in clip:
        t, ok = aligner.align_next_frame(jnp.asarray(f))
        t_stream.append(np.asarray(t))
        ok_stream.append(bool(ok))

    np.testing.assert_array_equal(np.asarray(ok_batch), np.asarray(ok_stream))
    np.testing.assert_allclose(np.asarray(t_batch), np.asarray(t_stream),
                               atol=1e-5)


def test_align_clip_odd_length():
    clip = gray_clip(n=N - 1)
    t_b, ok_b = align_clip(clip)
    assert t_b.shape == (N - 1, 4)
    assert ok_b.shape == (N - 1,)


def test_smooth_trajectory_matches_streaming_windows():
    r = np.random.default_rng(31)
    meas = r.normal(size=(30, 4)) * np.array([0.01, 0.01, 2.0, 2.0])
    params = StabilizerParams(lag=6, smoother_memory=3, lambda_=2.0)
    got = np.asarray(smooth_trajectory(jnp.asarray(meas, jnp.float32), params))
    # Oracle: reference windows, f64.
    outs = []
    for k in range(30 - 3):
        start = max(0, k - 6)
        win = meas[start : k + 3 + 1]
        sm = tvl1_smooth_np(win.T, 2.0)
        outs.append(sm[:, k - start])
    np.testing.assert_allclose(got, np.asarray(outs), atol=2e-3)


def test_stabilize_clip_matches_streaming():
    clip = synth_shaky_clip(N, H, W, seed=22, jitter_px=0.8,
                            pan_px_per_frame=0.3)
    params = StabilizerParams(crop_pixels=8)
    out_b, meas_b, ok_b = stabilize_clip(clip, params)

    stab = VideoStabilizer(params)
    outs_s = []
    for f in clip:
        o = stab.process_frame(f)
        if o is not None:
            outs_s.append(np.asarray(o))

    assert out_b.shape[0] == len(outs_s)
    # u8 output parity within 1 LSB (f32 vs f64 accumulation chains).
    diff = np.abs(np.asarray(out_b, np.int32) - np.asarray(outs_s, np.int32))
    assert np.mean(diff <= 1) > 0.995, np.mean(diff)


def test_stabilize_clip_reduces_jitter():
    clip = synth_shaky_clip(N, H, W, seed=23, jitter_px=1.0,
                            pan_px_per_frame=0.3)
    out, meas, ok = stabilize_clip(clip, StabilizerParams(crop_pixels=8))
    in_j = median_jitter_px(clip)
    out_j = median_jitter_px(list(np.asarray(out)))
    assert out_j < 0.6 * in_j, (in_j, out_j)


def test_stabilize_streams_batch():
    clips = np.stack([
        synth_shaky_clip(N, H, W, seed=s, jitter_px=0.8, pan_px_per_frame=0.2)
        for s in (41, 42)])
    out, meas, ok = stabilize_streams(clips, StabilizerParams(crop_pixels=8))
    assert out.shape == (2, N - 10, H - 16, W - 16, 3)
    # Per-stream results match single-clip runs (vmap changes XLA reduction
    # order, so allow 1-LSB wobble on the u8 output).
    out0, _, _ = stabilize_clip(clips[0], StabilizerParams(crop_pixels=8))
    diff = np.abs(np.asarray(out[0], np.int32) - np.asarray(out0, np.int32))
    assert np.mean(diff <= 1) > 0.995, np.mean(diff)
