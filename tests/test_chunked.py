"""Chunked streaming-batch equivalence: feeding a stream through
``stabilize_chunk_impl`` in pieces must reproduce the unchunked
``stabilize_clip_impl`` outputs exactly (VERDICT round-1 item 2 —
the chunk carry is the unbounded-stream serving path, so any drift here is
a correctness bug, not a tolerance question)."""

import numpy as np
import jax.numpy as jnp

from video_stabilizer_tpu.config import AlignerParams, StabilizerParams
from video_stabilizer_tpu.models.batch import stabilize_clip
from video_stabilizer_tpu.models.chunked import (
    ChunkedStabilizer,
    init_stream_state,
    stabilize_stream_chunked,
)
from video_stabilizer_tpu.utils.io import synth_shaky_clip

H, W, N = 96, 128, 24
PARAMS = StabilizerParams(lag=4, smoother_memory=2, crop_pixels=8)


def clip(seed=51, n=N, color=True):
    return synth_shaky_clip(n, H, W, seed=seed, jitter_px=0.8,
                            pan_px_per_frame=0.3, color=color)


def test_chunked_matches_unchunked():
    frames = clip()
    out_u, meas_u, ok_u = stabilize_clip(frames, PARAMS)
    out_c, meas_c, ok_c = stabilize_stream_chunked(frames, PARAMS,
                                                   chunk_size=N // 2)
    np.testing.assert_array_equal(np.asarray(ok_u), ok_c)
    np.testing.assert_allclose(np.asarray(meas_u), meas_c, atol=1e-6)
    assert out_c.shape == np.asarray(out_u).shape
    diff = np.abs(np.asarray(out_u, np.int32) - out_c.astype(np.int32))
    # Identical math modulo XLA reduction-order wobble on the u8 output.
    assert np.mean(diff <= 1) > 0.999, (np.mean(diff), diff.max())


def test_chunked_various_chunk_sizes():
    frames = clip(seed=52)
    ref_out, ref_meas, ref_ok = stabilize_stream_chunked(frames, PARAMS,
                                                         chunk_size=N)
    for cs in (2, 8):
        out, meas, ok = stabilize_stream_chunked(frames, PARAMS, chunk_size=cs)
        np.testing.assert_array_equal(ref_ok, ok)
        np.testing.assert_allclose(ref_meas, meas, atol=1e-6, err_msg=str(cs))
        diff = np.abs(ref_out.astype(np.int32) - out.astype(np.int32))
        assert np.mean(diff <= 1) > 0.999, (cs, np.mean(diff))


def test_chunked_smoother_disabled():
    frames = clip(seed=53)
    params = StabilizerParams(lag=4, smoother_memory=2, crop_pixels=8,
                              enable_smoother=False)
    out_u, meas_u, ok_u = stabilize_clip(frames, params)
    out_c, meas_c, ok_c = stabilize_stream_chunked(frames, params,
                                                   chunk_size=8)
    diff = np.abs(np.asarray(out_u, np.int32) - out_c.astype(np.int32))
    assert np.mean(diff <= 1) > 0.999, np.mean(diff)


def test_chunked_stabilizer_class_streams_indefinitely():
    frames = clip(seed=54, n=2 * N)
    stab = ChunkedStabilizer(PARAMS)
    got = []
    for start in range(0, 2 * N, 8):
        out, meas, succ = stab.process_chunk(frames[start:start + 8])
        got.append(np.asarray(out))
    got = np.concatenate(got, axis=0)
    assert got.shape[0] == 2 * N - PARAMS.lag
    ref, _, _ = stabilize_stream_chunked(frames, PARAMS, chunk_size=2 * N)
    diff = np.abs(ref.astype(np.int32) - got.astype(np.int32))
    assert np.mean(diff <= 1) > 0.999, np.mean(diff)


def test_chunked_homography_matches_clip_mode():
    """The 8-DOF family gets the same unbounded-stream serving mode."""
    from video_stabilizer_tpu.models.homography_aligner import (
        stabilize_clip_homography)

    frames = clip(seed=57, n=16)
    params = StabilizerParams(lag=4, smoother_memory=2, crop_pixels=8)
    out_u, meas_u, ok_u = stabilize_clip_homography(frames, params)
    out_c, meas_c, ok_c = stabilize_stream_chunked(frames, params,
                                                   chunk_size=8,
                                                   model="homography")
    np.testing.assert_array_equal(np.asarray(ok_u), ok_c)
    np.testing.assert_allclose(np.asarray(meas_u), meas_c, atol=1e-6)
    diff = np.abs(np.asarray(out_u, np.int32) - out_c.astype(np.int32))
    assert np.mean(diff <= 1) > 0.999, (np.mean(diff), diff.max())


def test_long_stream_soak():
    """Unbounded-stream soak: 40 chunks (320 frames) through one
    ChunkedStabilizer — state stays fixed-size, every post-lag input frame
    yields exactly one output, alignment keeps succeeding, and the
    stabilized stream's jitter stays reduced in the FINAL quarter (no
    drift/degradation as state ages)."""
    from video_stabilizer_tpu.utils.jitter import median_jitter_px

    n = 320
    frames = synth_shaky_clip(n, 72, 96, seed=59, jitter_px=0.6,
                              pan_px_per_frame=0.1)
    params = StabilizerParams(lag=4, smoother_memory=2, crop_pixels=6)
    stab = ChunkedStabilizer(params)
    outs, oks = [], []
    for start in range(0, n, 8):
        out, meas, ok = stab.process_chunk(frames[start:start + 8])
        outs.append(np.asarray(out))
        oks.append(np.asarray(ok))
    outs = np.concatenate(outs, axis=0)
    oks = np.concatenate(oks)
    assert outs.shape[0] == n - params.lag
    assert oks[2:].all()
    assert int(stab._state.steps_seen) == n
    tail_in = list(frames[-80:])
    tail_out = list(outs[-80:])
    assert median_jitter_px(tail_out) < 0.6 * median_jitter_px(tail_in)


def test_init_stream_state_shapes():
    st = init_stream_state(W, H, PARAMS)
    assert st.meas_tail.shape == (PARAMS.lag + PARAMS.smoother_memory, 4)
    assert st.frame_tail.shape == (PARAMS.lag, H, W, 3)
    assert int(st.steps_seen) == 0
