"""Numeric parity tests for every kernel against pure-numpy f64 oracles.

Each oracle re-derives the reference generator's math independently
(generators.cpp citations in the kernel docstrings), so agreement here means
the XLA kernels reproduce the Halide kernels' semantics.
"""

import numpy as np
import jax.numpy as jnp

from video_stabilizer_tpu import transforms as T
from video_stabilizer_tpu.config import tile_size_for
from video_stabilizer_tpu import ops
from conftest import make_test_image


# ---------------------------------------------------------------- oracles

def np_lanczos2(x):
    x = np.asarray(x, np.float64)
    val = np.where(
        np.abs(x) >= 2.0, 0.0,
        np.sinc(x) * np.sinc(x / 2.0))  # np.sinc includes the pi factor
    return val


def np_pyr_down(img):
    c = np.array([1, 4, 6, 4, 1], np.float64) / 16.0
    h, w = img.shape
    p = np.pad(img.astype(np.float64), 2, mode="edge")
    h2, w2 = h // 2, w // 2
    rows = sum(c[i] * p[i : i + 2 * h2 : 2, :] for i in range(5))
    out = sum(c[j] * rows[:, j : j + 2 * w2 : 2] for j in range(5))
    return out.astype(np.uint8)  # trunc toward zero, values >= 0


def np_grad_xy(img):
    p = np.pad(img.astype(np.float64), 1, mode="edge")
    gx = 0.5 * (p[1:-1, 2:] - p[1:-1, :-2])
    gy = 0.5 * (p[2:, 1:-1] - p[:-2, 1:-1])
    return gx, gy


def np_grad_argmax(g, t):
    h, w = g.shape
    ht, wt = h // t, w // t
    coords = np.zeros((ht, wt, 2), np.int64)
    for ty in range(ht):
        for tx in range(wt):
            tile = np.abs(g[ty * t : (ty + 1) * t, tx * t : (tx + 1) * t])
            # reference iteration: r.y outer, r.x inner; first max wins
            flat = tile.reshape(-1)
            k = int(np.argmax(flat))
            dy, dx = divmod(k, t)
            coords[ty, tx] = (tx * t + dx, ty * t + dy)
    return coords


def np_lanczos_sample(img, coords, t_ul):
    """f64 oracle of sparse_warp_sample (generators.cpp:459-498)."""
    h, w = img.shape
    a, b, tx, ty = [float(v) for v in t_ul]
    out = np.zeros(coords.shape[:-1], np.float64)
    it = np.ndindex(*coords.shape[:-1])
    for idx in it:
        ox, oy = float(coords[idx][0]), float(coords[idx][1])
        wx = (1 + a) * ox - b * oy + tx
        wy = b * ox + (1 + a) * oy + ty
        fx, fy = np.floor(wx), np.floor(wy)
        wxs = np_lanczos2(np.arange(5) - 2 - (wx - fx))
        wys = np_lanczos2(np.arange(5) - 2 - (wy - fy))
        num = den = 0.0
        for j in range(5):
            for i in range(5):
                sx = min(max(int(fx) + i - 2, 0), w - 1)
                sy = min(max(int(fy) + j - 2, 0), h - 1)
                w2 = wxs[i] * wys[j]
                num += w2 * img[sy, sx]
                den += w2
        out[idx] = num / den
    return out


# ----------------------------------------------------------------- tests

def test_lanczos2_poly_accuracy():
    # Polynomial max abs error on [-2, 2] is 3.84e-4 (lanczos2_opt.cpp:379-381).
    xs = np.linspace(-2.5, 2.5, 10001)
    poly = np.asarray(ops.lanczos2(jnp.asarray(xs, jnp.float32)), np.float64)
    exact = np_lanczos2(xs)
    assert np.max(np.abs(poly - exact)) < 5e-4
    # Zero outside the window and ~1 at 0.
    assert poly[0] == 0.0 and poly[-1] == 0.0
    assert abs(float(ops.lanczos2(jnp.float32(0.0))) - 1.0) < 2e-4


def test_lanczos2_exact_matches_numpy():
    xs = np.linspace(-2.5, 2.5, 101)
    got = np.asarray(ops.lanczos2_exact(jnp.asarray(xs)), np.float64)
    np.testing.assert_allclose(got, np_lanczos2(xs), atol=1e-6)


def test_pyr_down_oracle(test_image):
    got = np.asarray(ops.pyr_down(jnp.asarray(test_image)))
    want = np_pyr_down(test_image)
    # f32 vs f64 rounding can flip the final truncation by 1 LSB.
    assert got.shape == want.shape == (48, 64)
    assert np.mean(np.abs(got.astype(int) - want.astype(int)) <= 1) == 1.0
    assert np.mean(got.astype(int) == want.astype(int)) > 0.99


def test_pyr_down_batched(test_image):
    batch = jnp.stack([jnp.asarray(test_image)] * 3)
    out = ops.pyr_down(batch)
    assert out.shape == (3, 48, 64)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out[2]))


def test_pyr_down_constant_image():
    img = jnp.full((40, 60), 77, jnp.uint8)
    out = np.asarray(ops.pyr_down(img))
    # Repeat-edge on a constant image is exactly constant (76/77 after trunc).
    assert np.all(np.abs(out.astype(int) - 77) <= 1)


def test_grad_xy_oracle(test_image):
    gx, gy = ops.grad_xy(jnp.asarray(test_image))
    ogx, ogy = np_grad_xy(test_image)
    np.testing.assert_allclose(np.asarray(gx), ogx, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy), ogy, atol=1e-4)


def test_grad_xy_ramp():
    # A pure x-ramp has grad_x == slope, grad_y == 0 (interior).
    img = np.tile(np.arange(64, dtype=np.uint8) * 2, (32, 1))
    gx, gy = ops.grad_xy(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(gx)[:, 1:-1], 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), 0.0, atol=1e-5)


def test_tile_size_rule():
    # Replicates imgproc.cpp:151-162 expectations.
    assert tile_size_for(1920, 1080) == 20
    assert tile_size_for(960, 540) == 20
    assert tile_size_for(480, 270) == 10
    assert tile_size_for(240, 135) == 4
    assert tile_size_for(120, 67) == 2
    assert tile_size_for(60, 33) == 2
    assert tile_size_for(1280, 720) == 20  # 64*36 = 2304 >= 1000
    assert tile_size_for(320, 180) == 6    # 53*30 = 1590 >= 1000; t=8 -> 880


def test_grad_argmax_oracle(test_image):
    t = 8
    gx, gy = ops.grad_xy(jnp.asarray(test_image))
    idx_x, coords_x, idx_y, coords_y = ops.grad_argmax(gx, gy, t)
    ox = np_grad_argmax(np.asarray(gx, np.float64), t)
    oy = np_grad_argmax(np.asarray(gy, np.float64), t)
    np.testing.assert_array_equal(np.asarray(coords_x), ox)
    np.testing.assert_array_equal(np.asarray(coords_y), oy)
    # take_at_tile_argmax must reproduce direct indexing at the coords.
    gval = np.asarray(ops.take_at_tile_argmax(gx, idx_x, t))
    gx_np = np.asarray(gx)
    expect = gx_np[ox[..., 1], ox[..., 0]]
    np.testing.assert_allclose(gval, expect, atol=1e-6)


def test_sparse_jacobian_oracle(test_image):
    t = 8
    img = jnp.asarray(test_image)
    gx, gy = ops.grad_xy(img)
    idx_x, coords_x, idx_y, coords_y = ops.grad_argmax(gx, gy, t)
    gval_x = ops.take_at_tile_argmax(gx, idx_x, t)
    gval_y = ops.take_at_tile_argmax(gy, idx_y, t)
    h, w = test_image.shape
    jac_x, jac_y = ops.sparse_jacobian(gval_x, gval_y, coords_x, coords_y, w, h)

    # Oracle per generators.cpp:346-385.
    cx, cy, s = w * 0.5, h * 0.5, 1.0 / w
    gx_np, gy_np = np_grad_xy(test_image)
    cxs = np.asarray(coords_x)
    g = gx_np[cxs[..., 1], cxs[..., 0]]
    u = cxs[..., 0] - cx
    v = cxs[..., 1] - cy
    want = np.stack([2 * g * u * s, 2 * g * (-v) * s, 2 * g, 0 * g], -1)
    np.testing.assert_allclose(np.asarray(jac_x), want, rtol=1e-4, atol=1e-4)

    cys = np.asarray(coords_y)
    g = gy_np[cys[..., 1], cys[..., 0]]
    u = cys[..., 0] - cx
    v = cys[..., 1] - cy
    want = np.stack([2 * g * v * s, 2 * g * u * s, 0 * g, 2 * g], -1)
    np.testing.assert_allclose(np.asarray(jac_y), want, rtol=1e-4, atol=1e-4)


def test_sparse_warp_sample_oracle(test_image):
    img = jnp.asarray(test_image)
    r = np.random.default_rng(6789)
    coords = r.integers(5, 90, size=(40, 2)).astype(np.int32)
    t_center = T.make(0.01, -0.005, 1.5, -2.25)
    h, w = test_image.shape
    t_ul = T.center_to_ul(t_center, w, h, minus_one=False)
    got = np.asarray(ops.sparse_warp_sample(img, jnp.asarray(coords), t_ul))
    want = np_lanczos_sample(test_image.astype(np.float64), coords,
                             np.asarray(t_ul, np.float64))
    # poly-vs-exact lanczos difference dominates (max err 3.84e-4 * 255).
    np.testing.assert_allclose(got, want, atol=0.35)


def test_sparse_warp_sample_identity_is_exact(test_image):
    # At integer positions the Lanczos weights are one-hot: warped == image.
    img = jnp.asarray(test_image)
    r = np.random.default_rng(1)
    coords = r.integers(3, 90, size=(64, 2)).astype(np.int32)
    got = np.asarray(ops.sparse_warp_sample(img, jnp.asarray(coords),
                                            T.identity()))
    want = test_image[coords[:, 1], coords[:, 0]].astype(np.float64)
    np.testing.assert_allclose(got, want, atol=0.15)


def test_sparse_warpdiff_zero_on_identity_same_image(test_image):
    t = 8
    img = jnp.asarray(test_image)
    gx, gy = ops.grad_xy(img)
    idx_x, coords_x, _, _ = ops.grad_argmax(gx, gy, t)
    tmpl_vals = ops.take_at_tile_argmax(img, idx_x, t)
    wd = ops.sparse_warpdiff(tmpl_vals, img, coords_x, T.identity())
    assert float(jnp.max(wd)) < 0.2


def test_sparse_ica_zero_residual(test_image):
    # template == keyframe, identity warp -> b == 0.
    t = 8
    img = jnp.asarray(test_image)
    gx, gy = ops.grad_xy(img)
    idx_x, coords_x, idx_y, coords_y = ops.grad_argmax(gx, gy, t)
    h, w = test_image.shape
    gval_x = ops.take_at_tile_argmax(gx, idx_x, t)
    gval_y = ops.take_at_tile_argmax(gy, idx_y, t)
    jac_x, jac_y = ops.sparse_jacobian(gval_x, gval_y, coords_x, coords_y, w, h)
    tmpl_x = ops.take_at_tile_argmax(img, idx_x, t)
    tmpl_y = ops.take_at_tile_argmax(img, idx_y, t)
    mask = jnp.ones(tmpl_x.shape, jnp.float32)
    b = ops.sparse_ica(tmpl_x, tmpl_y, img, coords_x, coords_y,
                       jac_x, jac_y, mask, mask, T.identity())
    n_pts = tmpl_x.size
    # Residuals are bounded by lanczos poly error (~0.1 intensity).
    assert np.all(np.abs(np.asarray(b)) < 0.5 * n_pts * 0.01 + 50.0)


def test_sparse_ica_f64_oracle(test_image):
    """Full f64 oracle of the ICA RHS, small point set."""
    t = 16
    img = jnp.asarray(test_image)
    gx, gy = ops.grad_xy(img)
    idx_x, coords_x, idx_y, coords_y = ops.grad_argmax(gx, gy, t)
    h, w = test_image.shape
    gval_x = ops.take_at_tile_argmax(gx, idx_x, t)
    gval_y = ops.take_at_tile_argmax(gy, idx_y, t)
    jac_x, jac_y = ops.sparse_jacobian(gval_x, gval_y, coords_x, coords_y, w, h)
    tmpl_x = ops.take_at_tile_argmax(img, idx_x, t)
    tmpl_y = ops.take_at_tile_argmax(img, idx_y, t)
    mask = jnp.ones(tmpl_x.shape, jnp.float32)
    t_center = T.make(0.004, -0.002, 0.8, -0.6)
    t_ul = T.center_to_ul(t_center, w, h, minus_one=False)
    b = np.asarray(ops.sparse_ica(tmpl_x, tmpl_y, img, coords_x, coords_y,
                                  jac_x, jac_y, mask, mask, t_ul))

    # Oracle: f64 sum over both sets, exact lanczos sampling.
    def oracle_set(coords, jac, tmpl):
        warped = np_lanczos_sample(test_image.astype(np.float64),
                                   np.asarray(coords), np.asarray(t_ul, np.float64))
        res = np.asarray(tmpl, np.float64) - warped
        return np.einsum("hwc,hw->c", np.asarray(jac, np.float64), res)

    want = 0.5 * (oracle_set(coords_x, jac_x, tmpl_x)
                  + oracle_set(coords_y, jac_y, tmpl_y))
    # Relative tolerance: lanczos poly error ~4e-4*255*|J| per point.
    scale = np.abs(want) + np.sum(np.abs(np.asarray(jac_x))) * 0.15 + 1.0
    assert np.all(np.abs(b - want) / scale < 0.05)


def test_image_warp_matches_shift(test_image):
    # Integer-shift warp must equal a rolled image in the interior.
    img = jnp.asarray(test_image)
    t_ul = T.make(0.0, 0.0, 3.0, 5.0)  # sample at (x+3, y+5)
    out = np.asarray(ops.image_warp_ul(img, t_ul))
    h, w = test_image.shape
    want = test_image.astype(np.float32)[5:, 3:]
    np.testing.assert_allclose(out[: h - 5, : w - 3], want, atol=1e-3)


def test_image_warp_identity(test_image):
    out = np.asarray(ops.image_warp(jnp.asarray(test_image), T.identity()))
    np.testing.assert_allclose(out, test_image.astype(np.float32), atol=1e-3)


def test_warp_by_similarity_transform_identity(test_image):
    bgr = np.stack([test_image] * 3, -1)
    out = np.asarray(ops.warp_by_similarity_transform(jnp.asarray(bgr),
                                                      T.identity()))
    np.testing.assert_array_equal(out, bgr)


def test_warp_by_similarity_transform_inverse_direction(test_image):
    # warpBySimilarityTransform(src, T) == sample src at T^-1(p):
    # for pure translation T=(tx,ty), content moves BY (tx, ty).
    bgr = np.stack([test_image] * 3, -1)
    t = T.make(0.0, 0.0, 4.0, 0.0)
    out = np.asarray(ops.warp_by_similarity_transform(jnp.asarray(bgr), t))
    # content shifted right by 4: out[y, x+4] == src[y, x]
    np.testing.assert_allclose(
        out[:, 4:, 0].astype(int), bgr[:, :-4, 0].astype(int), atol=1)


def test_warp_bgr_lanczos_close_to_bilinear(test_image):
    bgr = jnp.asarray(np.stack([test_image] * 3, -1))
    t = T.make(0.001, 0.002, 1.3, -0.7)
    t_ul = T.center_to_ul(t, bgr.shape[1], bgr.shape[0], minus_one=True)
    a = np.asarray(ops.warp_image_bgr(bgr, t_ul, interp="bilinear")).astype(int)
    b = np.asarray(ops.warp_image_bgr(bgr, t_ul, interp="lanczos2")).astype(int)
    # Interpolators agree closely on a smooth image (not exactly).
    assert np.mean(np.abs(a - b)) < 3.0
