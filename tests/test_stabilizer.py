"""End-to-end stabilizer tests (video_test analog, video_test.cpp:10-128):
output cadence/lag accounting, jitter reduction on a synthetic shaky clip,
crop geometry, and failure-reset behavior."""

import numpy as np
import jax.numpy as jnp

from video_stabilizer_tpu.config import AlignerParams, StabilizerParams
from video_stabilizer_tpu.models import VideoStabilizer
from video_stabilizer_tpu.utils.io import synth_shaky_clip
from video_stabilizer_tpu.utils.jitter import median_jitter_px

H, W, N = 144, 192, 36


def run_clip(clip, params):
    stab = VideoStabilizer(params)
    outs = []
    for f in clip:
        out = stab.process_frame(f)
        if out is not None:
            outs.append(np.asarray(out))
    return outs, stab


def test_output_cadence_and_lag():
    clip = synth_shaky_clip(N, H, W, seed=11, jitter_px=0.8,
                            pan_px_per_frame=0.3)
    params = StabilizerParams(crop_pixels=8)
    outs, stab = run_clip(clip, params)
    # First output appears after lag+1 frames; one output per frame after.
    assert len(outs) == N - params.lag
    assert outs[0].shape == (H - 16, W - 16, 3)


def test_jitter_reduction():
    clip = synth_shaky_clip(N, H, W, seed=12, jitter_px=1.0,
                            pan_px_per_frame=0.3)
    outs, stab = run_clip(clip, StabilizerParams(crop_pixels=8))
    in_j = median_jitter_px(clip)
    out_j = median_jitter_px(outs)
    assert stab.align_failures <= 2
    assert out_j < 0.6 * in_j, (in_j, out_j)


def test_static_video_unchanged():
    frame = synth_shaky_clip(1, H, W, seed=13, jitter_px=0.0,
                             pan_px_per_frame=0.0)[0]
    clip = np.repeat(frame[None], 20, axis=0)
    outs, stab = run_clip(clip, StabilizerParams(crop_pixels=0))
    assert stab.align_failures == 0
    # Identity motion -> accum stays ~identity -> output == input.
    for o in outs[-3:]:
        assert np.mean(np.abs(o.astype(int) - frame.astype(int))) < 1.0


def test_smoother_disabled_removes_all_motion():
    # With the smoother off, jitter = raw measurement: the stabilizer
    # freezes the scene entirely (stabilizer.cpp:59-64 branch B).
    clip = synth_shaky_clip(N, H, W, seed=14, jitter_px=1.0,
                            pan_px_per_frame=0.0)
    outs, _ = run_clip(clip, StabilizerParams(enable_smoother=False,
                                              crop_pixels=8))
    out_j = median_jitter_px(outs)
    in_j = median_jitter_px(clip)
    assert out_j < 0.35 * in_j, (in_j, out_j)


def test_crop_disabled():
    clip = synth_shaky_clip(14, H, W, seed=15, jitter_px=0.5,
                            pan_px_per_frame=0.0)
    outs, _ = run_clip(clip, StabilizerParams(crop_pixels=0))
    assert outs[0].shape == (H, W, 3)


def test_decay_factor_bounds():
    from video_stabilizer_tpu.models.stabilizer import decay_factor
    p = StabilizerParams()
    assert decay_factor(0.0, p) == p.min_decay
    assert decay_factor(p.min_disp, p) == p.min_decay
    assert decay_factor(p.max_disp + 10, p) == p.max_decay
    mid = decay_factor((p.min_disp + p.max_disp) / 2, p)
    assert p.max_decay < mid < p.min_decay  # lerp between (note: decreasing)
