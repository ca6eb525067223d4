"""Merged coarse-level GN loop (AlignerParams.merge_coarse) equivalence.

The merged path runs the k coarsest levels' GN programs as one while_loop
over zero-padded union buffers (models/aligner.py:_align_levels_merged).
The padding argument (zero Lanczos weight on padded taps, zero Jacobian on
padded lanes, overflow-binned warp-diffs with a real-count keep target)
promises numerics identical to the unmerged per-level path up to f32
reduction order; these tests bound that promise on real aligned content.

Reference semantics being preserved: the per-level loop of
alignment.cpp:390-688 (prelude, GN iterations, failure checks, TX/TY
upscale between levels).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from video_stabilizer_tpu import transforms as T
from video_stabilizer_tpu.config import AlignerParams
from video_stabilizer_tpu.models.aligner import (
    align_next_frame,
    init_state,
    level_specs,
)
from video_stabilizer_tpu.utils.io import synth_shaky_clip

W, H = 256, 192


def _run_clip(params, n_frames=8, jitter_px=1.2, seed=3):
    clip = synth_shaky_clip(n_frames, H, W, seed=seed, jitter_px=jitter_px,
                            color=False)
    state = init_state(W, H, params)
    ts, oks = [], []
    for fr in clip:
        state, t, ok = align_next_frame(state, jnp.asarray(fr), params)
        ts.append(np.asarray(t))
        oks.append(bool(ok))
    return np.stack(ts), np.asarray(oks)


def _corner_delta_px(t_a, t_b):
    """Max corner displacement (px) between two batches of transforms."""
    corners = jnp.asarray(
        [[0.0, 0.0], [W - 1.0, 0.0], [0.0, H - 1.0], [W - 1.0, H - 1.0]])
    ca = T.warp_points_center(jnp.asarray(t_a)[:, None, :], corners[None],
                              W * 0.5, H * 0.5)
    cb = T.warp_points_center(jnp.asarray(t_b)[:, None, :], corners[None],
                              W * 0.5, H * 0.5)
    return float(jnp.max(jnp.linalg.norm(ca - cb, axis=-1)))


@pytest.mark.parametrize("k", [2, 3])
def test_merged_matches_unmerged(k):
    base = AlignerParams()
    merged = AlignerParams(merge_coarse=k)
    assert len(level_specs(W, H, base)) - 1 >= k
    t0, ok0 = _run_clip(base)
    t1, ok1 = _run_clip(merged)
    assert (ok0 == ok1).all()
    # f32 reduction order over the padded lanes is the ONLY source of
    # divergence; bound it at well below perceptual scale.
    delta = _corner_delta_px(t0, t1)
    assert delta <= 0.05, f"merged-vs-unmerged corner delta {delta:.4f}px"


def test_merged_recovers_known_transform():
    """The merged path must still recover a known inter-frame motion (the
    same end-to-end contract the unmerged aligner is held to)."""
    from video_stabilizer_tpu.ops import warp_image_bgr

    rng = np.random.default_rng(11)
    base = np.clip(
        rng.normal(128, 40, (H, W)).astype(np.float32), 0, 255
    ).astype(np.uint8)
    # Smooth the noise so the pyramid has structure at every level.
    img = jnp.asarray(base)
    for _ in range(2):
        img = (img.astype(jnp.float32)
               + jnp.roll(img, 1, 0) + jnp.roll(img, -1, 0)
               + jnp.roll(img, 1, 1) + jnp.roll(img, -1, 1)) / 5.0
    img = img.astype(jnp.uint8)
    t_true = T.make(0.0, 0.004, 1.6, -1.1)
    t_ul = T.center_to_ul(t_true, W, H, minus_one=True)
    warped = warp_image_bgr(img[..., None], T.inverse(t_ul),
                            interp="lanczos2", border="edge")[..., 0]
    params = AlignerParams(merge_coarse=2)
    state = init_state(W, H, params)
    state, _, _ = align_next_frame(state, img, params)
    state, t, ok = align_next_frame(state, warped.astype(jnp.uint8), params)
    assert bool(ok)
    delta = _corner_delta_px(np.asarray(t)[None],
                             np.asarray(t_true)[None])
    assert delta < 0.4, f"recovered transform off by {delta:.3f}px"


def test_merged_failure_semantics():
    """A scene cut must fail identically under the merged path (the same
    decorrelated-content fixture test_failure_injection.py uses)."""
    hc, wc = 96, 128   # the proven capture-envelope-breaking fixture size
    a = synth_shaky_clip(12, hc, wc, seed=301, jitter_px=0.6,
                         pan_px_per_frame=0.2, color=False)
    b = synth_shaky_clip(4, hc, wc, seed=777, jitter_px=0.6,
                         pan_px_per_frame=0.2, color=False)
    frames = np.concatenate([a, b], axis=0)
    oks = {}
    for name, params in (("base", AlignerParams()),
                         ("merged", AlignerParams(merge_coarse=2))):
        state = init_state(wc, hc, params)
        flags = []
        for fr in frames:
            state, _, ok = align_next_frame(state, jnp.asarray(fr), params)
            flags.append(bool(ok))
        oks[name] = flags
    assert oks["base"] == oks["merged"]
    assert not oks["base"][len(a)], oks["base"]   # the cut frame fails
