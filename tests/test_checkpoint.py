"""Checkpoint/resume: a stabilizer saved mid-stream and restored must
produce identical subsequent outputs to one that ran uninterrupted."""

import numpy as np
import jax.numpy as jnp

from video_stabilizer_tpu.config import StabilizerParams
from video_stabilizer_tpu.models import VideoStabilizer
from video_stabilizer_tpu.models.aligner import init_state
from video_stabilizer_tpu.utils.checkpoint import (
    load_aligner_state,
    load_stabilizer,
    save_aligner_state,
    save_stabilizer,
)
from video_stabilizer_tpu.utils.io import synth_shaky_clip

H, W, N = 96, 128, 24


def test_aligner_state_round_trip(tmp_path):
    from video_stabilizer_tpu.config import AlignerParams
    from video_stabilizer_tpu.models.aligner import align_next_frame

    params = AlignerParams()
    clip = synth_shaky_clip(4, H, W, seed=71, jitter_px=0.5, color=False)
    state = init_state(W, H, params)
    for f in clip:
        state, t, ok = align_next_frame(state, jnp.asarray(f), params)

    path = str(tmp_path / "aligner.npz")
    save_aligner_state(path, state)
    restored = load_aligner_state(path, init_state(W, H, params))
    import jax
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stabilizer_resume_identical_outputs(tmp_path):
    clip = synth_shaky_clip(N, H, W, seed=72, jitter_px=0.8,
                            pan_px_per_frame=0.2)
    params = StabilizerParams(crop_pixels=4)

    # Uninterrupted run.
    ref = VideoStabilizer(params)
    ref_outs = []
    for f in clip:
        o = ref.process_frame(f)
        if o is not None:
            ref_outs.append(np.asarray(o))

    # Run half, checkpoint, restore, run the rest.
    half = N // 2
    a = VideoStabilizer(params)
    outs = []
    for f in clip[:half]:
        o = a.process_frame(f)
        if o is not None:
            outs.append(np.asarray(o))
    path = str(tmp_path / "stab.npz")
    save_stabilizer(path, a)
    b = load_stabilizer(path, params)
    for f in clip[half:]:
        o = b.process_frame(f)
        if o is not None:
            outs.append(np.asarray(o))

    assert len(outs) == len(ref_outs)
    for x, y in zip(outs, ref_outs):
        np.testing.assert_array_equal(x, y)
