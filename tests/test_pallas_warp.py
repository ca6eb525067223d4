"""Pins the Pallas tile-local-base output warp (ops/pallas_warp.py) to the
exact gather oracle and to the XLA FIR warp it replaces on TPU. Runs in
Pallas interpreter mode on CPU; the same kernel compiles on real TPU (the
bench path)."""

import numpy as np
import jax.numpy as jnp

from video_stabilizer_tpu.ops.fast_warp import warp_image_fast
from video_stabilizer_tpu.ops.pallas_warp import warp_image_pallas
from video_stabilizer_tpu.ops.warp import warp_image_bgr
from conftest import natural_image

H, W = 200, 300


def color_image(seed=7):
    return np.stack([natural_image(H, W, seed=seed + k) for k in range(3)],
                    axis=-1)


def run_pair(img, t, **kw):
    t = jnp.asarray(t, jnp.float32)
    got = warp_image_pallas(jnp.asarray(img), t, **kw)
    exact = warp_image_bgr(jnp.asarray(img), t,
                           interp=kw.get("interp", "bilinear"), border="zero")
    return np.asarray(got, np.int32), np.asarray(exact, np.int32)


def test_integer_translation_bit_exact():
    img = color_image()
    for tx, ty in [(0, 0), (5, -9), (-120, 77)]:
        got, exact = run_pair(img, [0.0, 0.0, tx, ty])
        np.testing.assert_array_equal(got, exact, err_msg=f"{tx},{ty}")


def test_subpixel_and_rotation_match_oracle():
    img = color_image(seed=11)
    rng = np.random.default_rng(3)
    for _ in range(4):
        a, b = rng.uniform(-0.008, 0.008, 2)
        tx, ty = rng.uniform(-25, 25, 2)
        got, exact = run_pair(img, [a, b, tx, ty])
        diff = np.abs(got - exact)
        assert np.mean(diff <= 1) > 0.999, (a, b, np.mean(diff <= 1))
        assert diff.max() <= 3, (a, b, diff.max())


def test_larger_rotation_than_global_base_envelope():
    """|B| = 0.012 exceeds the XLA FIR's global-base envelope at this
    radius scale but sits inside the tile-local bound (m=3 -> 0.014)."""
    img = color_image(seed=13)
    b = 0.012
    got, exact = run_pair(img, [0.0, b, 3.0, -2.0])
    diff = np.abs(got - exact)
    assert np.mean(diff <= 2) > 0.995, (np.mean(diff <= 2), diff.max())


def test_matches_fir_warp():
    """Drop-in parity with the XLA FIR kernel it replaces on TPU."""
    img = color_image(seed=17)
    t = jnp.asarray([0.002, -0.004, 12.6, -8.2], jnp.float32)
    got = np.asarray(warp_image_pallas(jnp.asarray(img), t), np.int32)
    fir = np.asarray(warp_image_fast(jnp.asarray(img), t), np.int32)
    diff = np.abs(got - fir)
    assert np.mean(diff <= 1) > 0.999, (np.mean(diff <= 1), diff.max())


def test_lanczos2():
    img = color_image(seed=19)
    got, exact = run_pair(img, [0.003, -0.002, 4.4, 6.6], interp="lanczos2")
    diff = np.abs(got - exact)
    assert np.mean(diff <= 2) > 0.999, (np.mean(diff <= 2), diff.max())


def test_homography_model():
    """model="homography" against the gather oracle via the similarity
    embedding (zero perspective) and with real perspective terms against
    warp_homography_fast."""
    from video_stabilizer_tpu import homography as Hm
    from video_stabilizer_tpu import transforms as T
    from video_stabilizer_tpu.ops.fast_warp import warp_homography_fast
    from video_stabilizer_tpu.ops.pallas_warp import warp_frames_pallas

    img = color_image(seed=37)
    t_center = jnp.asarray([0.004, -0.006, 9.0, -5.0], jnp.float32)
    p = Hm.sim_to_homography(t_center, W, H)
    got = np.asarray(warp_frames_pallas(
        jnp.asarray(img)[None], p[None], model="homography")[0], np.int32)
    t_ul = T.center_to_ul(t_center, W, H, minus_one=False)
    exact = np.asarray(
        warp_image_bgr(jnp.asarray(img), t_ul, border="zero"), np.int32)
    diff = np.abs(got - exact)
    assert np.mean(diff <= 2) > 0.999, (np.mean(diff <= 2), diff.max())

    p2 = jnp.asarray([0.003, -0.002, 6.0 / W, 0.004, 0.001, -4.0 / W,
                      0.01, -0.008], jnp.float32)
    got2 = np.asarray(warp_frames_pallas(
        jnp.asarray(img)[None], p2[None], model="homography")[0], np.int32)
    fir2 = np.asarray(warp_homography_fast(jnp.asarray(img), p2), np.int32)
    diff2 = np.abs(got2 - fir2)
    assert np.mean(diff2 <= 2) > 0.995, (np.mean(diff2 <= 2), diff2.max())


def test_grayscale_input():
    img = natural_image(H, W, seed=23)
    got, exact = run_pair(img, [0.0, 0.0, 3.5, -1.25])
    assert got.shape == (H, W)
    assert np.abs(got - exact).max() <= 1
