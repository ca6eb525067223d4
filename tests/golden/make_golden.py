"""Generates the golden measurement trace (run from repo root on CPU):

    python tests/golden/make_golden.py

Regenerate ONLY when a deliberate numeric-semantics change is made; the
whole point of the fixture is to catch *accidental* drift (VERDICT round-1
item 7). The trace pins the aligner's (T, 4) measurements and the
stabilizer's accumulated corrections for a fixed rotational+translational
synthetic clip.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax.numpy as jnp

# Shared spec, imported by the test.
CLIP_SPEC = dict(num_frames=24, height=144, width=192, seed=777,
                 jitter_px=1.0, pan_px_per_frame=0.3,
                 rot_jitter=0.002, zoom_jitter=0.001, color=False)
PARAMS_SPEC = dict(lag=4, smoother_memory=2, crop_pixels=8)


def compute():
    from video_stabilizer_tpu.config import StabilizerParams
    from video_stabilizer_tpu.models.batch import (
        accumulate_corrections, align_clip, smooth_trajectory)
    from video_stabilizer_tpu.utils.io import synth_shaky_clip

    clip = synth_shaky_clip(**CLIP_SPEC)
    params = StabilizerParams(**PARAMS_SPEC)
    meas, ok = align_clip(clip, params.aligner)
    smoothed = smooth_trajectory(meas, params)
    accums = accumulate_corrections(meas, ok, smoothed, params,
                                    CLIP_SPEC["width"], CLIP_SPEC["height"])
    return (np.asarray(meas, np.float64), np.asarray(ok),
            np.asarray(accums, np.float64))


if __name__ == "__main__":
    meas, ok, accums = compute()
    out = os.path.join(os.path.dirname(__file__), "meas_trace_v1.npz")
    np.savez_compressed(out, meas=meas, ok=ok, accums=accums)
    print(f"wrote {out}: meas {meas.shape}, ok sum {ok.sum()}, "
          f"accums {accums.shape}")
    print("meas head:", meas[2])
