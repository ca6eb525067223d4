"""8-DOF homography model family: algebra properties, golden recovery of an
injected projective warp, and the full homography stabilization pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from video_stabilizer_tpu import homography as Hm
from video_stabilizer_tpu import transforms as T
from video_stabilizer_tpu.config import AlignerParams, StabilizerParams
from video_stabilizer_tpu.models.homography_aligner import (
    align_clip_homography,
    stabilize_clip_homography,
)
from video_stabilizer_tpu.ops.fast_warp import warp_homography_fast
from video_stabilizer_tpu.utils.io import synth_shaky_clip
from video_stabilizer_tpu.utils.jitter import median_jitter_px
from conftest import natural_image

H, W = 180, 240


def rand_h(seed, scale=0.02, persp=0.01):
    r = np.random.default_rng(seed)
    p = np.zeros(8, np.float32)
    p[[0, 1, 3, 4]] = r.uniform(-scale, scale, 4)
    p[[2, 5]] = r.uniform(-scale, scale, 2)
    p[[6, 7]] = r.uniform(-persp, persp, 2)
    return jnp.asarray(p)


def test_algebra_round_trips():
    for seed in range(5):
        p = rand_h(seed)
        np.testing.assert_allclose(
            np.asarray(Hm.from_matrix(Hm.to_matrix(p))), np.asarray(p),
            atol=1e-6)
        ident = Hm.compose(p, Hm.inverse(p))
        np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-5)


def test_compose_matches_sequential():
    pts = jnp.asarray(np.random.default_rng(1).uniform(20, 150, (10, 2)),
                      jnp.float32)
    a, b = rand_h(10), rand_h(11)
    seq = Hm.warp_points(b, Hm.warp_points(a, pts, W, H), W, H)
    direct = Hm.warp_points(Hm.compose(a, b), pts, W, H)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(seq), atol=1e-2)


def test_similarity_embedding_matches():
    t = T.make(0.01, -0.02, 3.0, -2.0)
    p = Hm.sim_to_homography(t, W, H)
    pts = jnp.asarray([[10.0, 20.0], [200.0, 150.0], [120.0, 90.0]])
    want = T.warp_points_center(t, pts, W * 0.5, H * 0.5)
    got = Hm.warp_points(p, pts, W, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_recover_injected_homography():
    img = natural_image(H, W, seed=50)
    # True motion: slight rotation + translation + mild perspective.
    p_true = jnp.asarray([0.002, -0.004, 1.5 / W, 0.003, 0.001, -1.0 / W,
                          0.004, -0.003], jnp.float32)
    # frame1 content moves by p_true: sample at inverse.
    f1 = warp_homography_fast(jnp.asarray(img), Hm.inverse(p_true),
                              interp="lanczos2", residual_bound=10)
    # zero-border corners are fine; the selection masks them out.
    clip = np.stack([img, np.asarray(f1)])
    p_got, ok = align_clip_homography(clip, AlignerParams())
    assert bool(ok[1])
    corners = jnp.asarray([[8.0, 8.0], [W - 9.0, 8.0], [8.0, H - 9.0],
                           [W - 9.0, H - 9.0]])
    want = np.asarray(Hm.warp_points(p_true, corners, W, H))
    got = np.asarray(Hm.warp_points(p_got[1], corners, W, H))
    err = np.max(np.hypot(*(got - want).T))
    assert err < 0.6, (err, np.asarray(p_got[1]), np.asarray(p_true))


def test_static_video_identity_homography():
    img = natural_image(H, W, seed=51)
    clip = np.stack([img] * 6)
    p, ok = align_clip_homography(clip, AlignerParams())
    assert np.all(np.asarray(ok)[1:])
    np.testing.assert_allclose(np.asarray(p)[1:], 0.0, atol=2e-3)


def test_stabilize_clip_homography_reduces_jitter():
    clip = synth_shaky_clip(24, 144, 192, seed=61, jitter_px=1.0,
                            pan_px_per_frame=0.3)
    out, meas, ok = stabilize_clip_homography(
        clip, StabilizerParams(crop_pixels=8))
    assert out.shape == (14, 128, 176, 3)
    in_j = median_jitter_px(clip)
    out_j = median_jitter_px(list(np.asarray(out)))
    assert out_j < 0.65 * in_j, (in_j, out_j)


def test_config4_phase_lanczos_homography_e2e():
    """BASELINE.json config 4 at reduced size: 8-DOF homography model +
    phase-correlation init + Lanczos2 output warp, on a clip with
    rotational/zoom jitter (the 4K serving configuration, exercised E2E
    so apps/bench_configs.py --mode 4k runs a tested path)."""
    clip = synth_shaky_clip(16, 144, 192, seed=67, jitter_px=0.9,
                            pan_px_per_frame=0.3, rot_jitter=0.003,
                            zoom_jitter=0.002)
    params = StabilizerParams(
        aligner=AlignerParams(phase_correlate=True),
        output_interp="lanczos2", lag=4, smoother_memory=2, crop_pixels=10)
    out, meas, ok = stabilize_clip_homography(clip, params)
    assert np.asarray(ok)[2:].all()
    in_j = median_jitter_px(clip)
    out_j = median_jitter_px(list(np.asarray(out)))
    assert out_j < 0.65 * in_j, (in_j, out_j)


def test_eigh_sym8():
    from video_stabilizer_tpu.ops.linalg import eigh_sym
    r = np.random.default_rng(2)
    A = r.standard_normal((8, 8))
    Hmat = (A @ A.T).astype(np.float32)
    w, V = eigh_sym(jnp.asarray(Hmat))
    rec = np.asarray(V) @ np.diag(np.asarray(w)) @ np.asarray(V).T
    np.testing.assert_allclose(rec, Hmat, atol=1e-3 * np.abs(Hmat).max())
    want = np.linalg.eigvalsh(Hmat.astype(np.float64))
    np.testing.assert_allclose(np.sort(np.asarray(w)), want, rtol=1e-3,
                               atol=1e-4 * np.abs(want).max())
