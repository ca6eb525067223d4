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


def test_qy_modes_bit_identical():
    """The three row-remainder mechanisms (taps / roll / switch) are pure
    schedule choices: same taps, same weights, same f32 accumulation order
    per pixel — outputs must be BIT-identical for every qy in [0, 8)
    (ty sweeps one full sublane period) and for both interps/models."""
    from video_stabilizer_tpu.ops.pallas_warp import warp_frames_pallas

    img = jnp.asarray(color_image(seed=41))
    rng = np.random.default_rng(9)
    for k in range(8):  # ty fraction walks every sublane remainder
        t = jnp.asarray([rng.uniform(-0.004, 0.004),
                         rng.uniform(-0.004, 0.004),
                         rng.uniform(-30, 30), -14.0 + k + 0.37],
                        jnp.float32)
        for interp in ("bilinear", "lanczos2"):
            base = np.asarray(warp_frames_pallas(
                img[None], t[None], interp=interp, qy_mode="taps")[0])
            for mode in ("roll", "switch"):
                got = np.asarray(warp_frames_pallas(
                    img[None], t[None], interp=interp, qy_mode=mode)[0])
                np.testing.assert_array_equal(
                    got, base, err_msg=f"qy_mode={mode} interp={interp} k={k}")


def test_qy_modes_homography():
    from video_stabilizer_tpu.ops.pallas_warp import warp_frames_pallas

    img = jnp.asarray(color_image(seed=43))
    p = jnp.asarray([0.003, -0.002, 6.0 / W, 0.004, 0.001, -4.37 / W,
                     0.01, -0.008], jnp.float32)
    base = np.asarray(warp_frames_pallas(
        img[None], p[None], model="homography", interp="lanczos2",
        qy_mode="taps")[0])
    for mode in ("roll", "switch"):
        got = np.asarray(warp_frames_pallas(
            img[None], p[None], model="homography", interp="lanczos2",
            qy_mode=mode)[0])
        np.testing.assert_array_equal(got, base, err_msg=f"qy_mode={mode}")


def test_tile_override_matches_default():
    """Tile shape is a schedule knob, but NOT a bit-exact one: a different
    per-tile integer base changes the f32 argument of the weight polynomial
    by an exact integer, whose different rounding moves outputs by at most
    1 LSB (measured: <0.2% of pixels). Pin that bound, plus the qy-mode
    bit-equality WITHIN a fixed tile."""
    from video_stabilizer_tpu.ops.pallas_warp import warp_frames_pallas

    img = jnp.asarray(color_image(seed=47))
    t = jnp.asarray([0.003, -0.002, 17.3, -6.8], jnp.float32)
    base = np.asarray(warp_frames_pallas(
        img[None], t[None], interp="lanczos2")[0]).astype(np.int32)
    for tile in ((96, 128), (200, 256), (216, 1024)):
        got = np.asarray(warp_frames_pallas(
            img[None], t[None], interp="lanczos2", tile=tile,
            qy_mode="roll")[0]).astype(np.int32)
        d = np.abs(got - base)
        assert d.max() <= 1 and (d > 0).mean() < 0.005, \
            f"tile={tile}: max {d.max()}, frac {(d > 0).mean():.4f}"
        got_taps = np.asarray(warp_frames_pallas(
            img[None], t[None], interp="lanczos2", tile=tile,
            qy_mode="taps")[0]).astype(np.int32)
        np.testing.assert_array_equal(got, got_taps,
                                      err_msg=f"qy modes at tile={tile}")
    import pytest
    with pytest.raises(ValueError):
        warp_frames_pallas(img[None], t[None], tile=(100, 512))
