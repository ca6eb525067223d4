"""Pins the gather-free output warp (ops/fast_warp.py) — the hottest output
kernel, with documented approximations — to the exact gather-based oracle
(ops/warp.py warp_image_bgr). VERDICT round-1 item 4.

Envelope arithmetic used below: after bulk-translation removal the per-pixel
residual of a similarity warp is |(A,B)| * corner_radius + subpixel; with
residual_bound m the interpolation is exact while that stays <= m. The test
image is 144x192 (radius 120), so m=4 covers |A,B| <= 0.025.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from video_stabilizer_tpu import transforms as T
from video_stabilizer_tpu.config import default_residual_bound
from video_stabilizer_tpu.ops.fast_warp import (
    warp_homography_fast,
    warp_image_fast,
)
from video_stabilizer_tpu.ops.warp import warp_image_bgr
from conftest import natural_image

H, W = 144, 192


def color_image(seed=7):
    g = natural_image(H, W, seed=seed)
    b = natural_image(H, W, seed=seed + 1)
    r = natural_image(H, W, seed=seed + 2)
    return np.stack([b, g, r], axis=-1)


def run_both(img, t, interp="bilinear", residual_bound=4):
    t = jnp.asarray(t, jnp.float32)
    fast = warp_image_fast(jnp.asarray(img), t, interp=interp,
                           residual_bound=residual_bound)
    exact = warp_image_bgr(jnp.asarray(img), t, interp=interp, border="zero")
    return np.asarray(fast, np.int32), np.asarray(exact, np.int32)


def test_integer_translation_bit_exact():
    img = color_image()
    for tx, ty in [(0, 0), (3, -7), (-40, 25), (150, -150)]:
        fast, exact = run_both(img, [0.0, 0.0, tx, ty])
        np.testing.assert_array_equal(fast, exact, err_msg=f"tx={tx} ty={ty}")


def test_subpixel_translation_one_lsb():
    img = color_image(seed=11)
    rng = np.random.default_rng(0)
    for _ in range(5):
        tx, ty = rng.uniform(-30, 30, 2)
        fast, exact = run_both(img, [0.0, 0.0, tx, ty])
        diff = np.abs(fast - exact)
        # bf16 x-pass intermediate: <=1 LSB on subpixel translations.
        assert diff.max() <= 1, (tx, ty, diff.max())


def test_rotation_zoom_within_envelope_two_lsb():
    img = color_image(seed=13)
    rng = np.random.default_rng(1)
    for _ in range(5):
        a = rng.uniform(-0.015, 0.015)
        b = rng.uniform(-0.015, 0.015)
        tx, ty = rng.uniform(-10, 10, 2)
        fast, exact = run_both(img, [a, b, tx, ty])
        diff = np.abs(fast - exact)
        # The y-pass weight is evaluated at the read column (documented
        # O(B*m*|grad|) error): <=2 LSB inside the residual envelope.
        frac_ok = np.mean(diff <= 2)
        assert frac_ok > 0.999, (a, b, frac_ok, diff.max())
        assert diff.max() <= 8, (a, b, diff.max())


def test_lanczos2_within_envelope():
    img = color_image(seed=17)
    fast, exact = run_both(img, [0.004, -0.006, 5.3, -2.7], interp="lanczos2")
    diff = np.abs(fast - exact)
    assert np.mean(diff <= 2) > 0.999, (np.mean(diff <= 2), diff.max())


def test_decay_threshold_scale_translation_still_exact():
    """The decay thresholds permit 48-64 px of corner displacement
    (stabilizer.hpp:24-29). Pure translation of that size is bulk-removed,
    so the fast warp stays exact regardless of residual_bound."""
    img = color_image(seed=19)
    for tx, ty in [(48.0, 0.0), (-64.0, 33.0), (45.5, -60.25)]:
        fast, exact = run_both(img, [0.0, 0.0, tx, ty])
        assert np.abs(fast - exact).max() <= 1, (tx, ty)


def test_beyond_envelope_rotation_clamps_gracefully():
    """|B| beyond the envelope: residuals clamp to +-m, so far-from-center
    pixels degrade (documented behavior) but never wrap, explode, or leave
    the u8 range, and the central region (where the residual is still
    within bound) stays exact."""
    img = color_image(seed=23)
    b = 0.06  # residual at corners ~7.2 px > m=4
    fast, exact = run_both(img, [0.0, b, 0.0, 0.0])
    # Central half: residual <= 0.06 * 60 = 3.6 < 4 -> still exact-ish.
    ch, cw = H // 4, W // 4
    center_diff = np.abs(fast[ch:-ch, cw:-cw] - exact[ch:-ch, cw:-cw])
    assert np.mean(center_diff <= 2) > 0.99, np.mean(center_diff <= 2)
    # Everywhere: finite, in-range (clamping, not wrap-around).
    assert fast.min() >= 0 and fast.max() <= 255


def test_larger_bound_extends_envelope():
    """Raising residual_bound must extend accuracy to larger rotations —
    the knob the per-resolution default (config.default_residual_bound)
    turns at 4K. At |B|=0.06 the un-clamped y-pass error O(B*m*|grad|)
    becomes the limiter (~1% of pixels beyond 2 LSB at m=9), so the
    assertion is strict improvement over the clamped m=4 run plus the
    accuracy the error model supports."""
    img = color_image(seed=29)
    b = 0.06
    fast9, exact = run_both(img, [0.0, b, 0.0, 0.0], residual_bound=9)
    fast4, _ = run_both(img, [0.0, b, 0.0, 0.0], residual_bound=4)
    ok9 = np.mean(np.abs(fast9 - exact) <= 2)
    ok4 = np.mean(np.abs(fast4 - exact) <= 2)
    assert ok9 > ok4, (ok9, ok4)
    assert ok9 > 0.98, ok9


def test_homography_fast_vs_similarity_oracle():
    """A homography with zero perspective terms equals a similarity warp:
    cross-checks warp_homography_fast (center-pivot normalized
    parameterization) against the similarity oracle (origin-based)."""
    from video_stabilizer_tpu import homography as Hm

    img = color_image(seed=31)
    t_center = jnp.asarray([0.005, -0.008, 4.0, -6.0], jnp.float32)
    p = Hm.sim_to_homography(t_center, W, H)
    t_ul = T.center_to_ul(t_center, W, H, minus_one=False)
    fast = np.asarray(warp_homography_fast(jnp.asarray(img), p), np.int32)
    exact = np.asarray(
        warp_image_bgr(jnp.asarray(img), t_ul, border="zero"), np.int32)
    diff = np.abs(fast - exact)
    assert np.mean(diff <= 2) > 0.999, (np.mean(diff <= 2), diff.max())


def test_default_residual_bound_scales_with_resolution():
    assert default_residual_bound(1920, 1080) == 4
    assert default_residual_bound(1280, 720) == 4
    assert default_residual_bound(3840, 2160) == 7
