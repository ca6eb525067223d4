"""Property tests for the similarity-transform algebra.

Mirrors the reference's align_test.cpp test suite:
  - fixed-case inverse round trips           (align_test.cpp:261-303)
  - compose vs sequential application        (align_test.cpp:311-346)
  - randomized inverse (seed 12345)          (align_test.cpp:444-480)
  - randomized compose + associativity       (align_test.cpp:487-551, seed 6789)
  - inverse(compose) ~ identity (seed 9999)  (align_test.cpp:557-601)
with the reference's EPSILON = 1e-5 (align_test.cpp:249) where float64 is
used; float32 paths get a proportionally looser tolerance.
"""

import numpy as np
import jax.numpy as jnp

from video_stabilizer_tpu import transforms as T

EPS = 1e-5


def rand_transforms(seed, n, scale=0.1):
    r = np.random.default_rng(seed)
    t = np.zeros((n, 4))
    t[:, 0] = r.uniform(-scale, scale, n)          # A
    t[:, 1] = r.uniform(-scale, scale, n)          # B
    t[:, 2] = r.uniform(-20 * scale, 20 * scale, n)  # TX
    t[:, 3] = r.uniform(-20 * scale, 20 * scale, n)  # TY
    return jnp.asarray(t, jnp.float64 if jnp.zeros(1).dtype == jnp.float64 else jnp.float32)


def rand_points(seed, n):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.uniform(-100, 100, (n, 2)), jnp.float32)


def test_identity_warp():
    pts = rand_points(1, 32)
    out = T.warp_points(T.identity(), pts)
    np.testing.assert_allclose(out, pts, atol=EPS)


def test_fixed_inverse_round_trip():
    # Fixed cases in the spirit of align_test.cpp:261-303.
    cases = [
        (0.0, 0.0, 5.0, -3.0),
        (0.1, 0.0, 0.0, 0.0),
        (0.0, 0.05, 2.0, 2.0),
        (-0.02, 0.03, -7.5, 4.25),
    ]
    pts = rand_points(2, 16)
    for a, b, tx, ty in cases:
        t = T.make(a, b, tx, ty)
        tinv = T.inverse(t)
        round_trip = T.warp_points(tinv, T.warp_points(t, pts))
        np.testing.assert_allclose(round_trip, pts, atol=1e-3)


def test_compose_matches_sequential():
    t1s = rand_transforms(6789, 20)
    t2s = rand_transforms(6790, 20)
    pts = rand_points(3, 8)
    for i in range(20):
        t1, t2 = t1s[i], t2s[i]
        t3 = T.compose(t1, t2)
        seq = T.warp_points(t2, T.warp_points(t1, pts))
        direct = T.warp_points(t3, pts)
        np.testing.assert_allclose(direct, seq, atol=1e-3)


def test_compose_associative():
    a = rand_transforms(10, 10)
    b = rand_transforms(11, 10)
    c = rand_transforms(12, 10)
    lhs = T.compose(T.compose(a, b), c)
    rhs = T.compose(a, T.compose(b, c))
    np.testing.assert_allclose(lhs, rhs, atol=1e-3)


def test_randomized_inverse_compose_identity():
    # inverse(T) composed with T is identity (seed 9999 in the reference).
    ts = rand_transforms(9999, 50)
    ident = T.compose(ts, T.inverse(ts))
    np.testing.assert_allclose(ident, np.zeros((50, 4)), atol=1e-3)


def test_inverse_f64_oracle():
    # Validate the closed form against numpy f64 2x2 matrix inversion.
    ts = np.asarray(rand_transforms(12345, 50), np.float64)
    for t in ts:
        a, b, tx, ty = t
        M = np.array([[1 + a, -b], [b, 1 + a]])
        Minv = np.linalg.inv(M)
        tinv = np.asarray(T.inverse(jnp.asarray(t, jnp.float32)), np.float64)
        Mi = np.array([[1 + tinv[0], -tinv[1]], [tinv[1], 1 + tinv[0]]])
        np.testing.assert_allclose(Mi, Minv, atol=1e-4)
        np.testing.assert_allclose(
            tinv[2:], -Minv @ np.array([tx, ty]), atol=1e-4)


def test_center_warp_equals_origin_warp_at_zero_center():
    ts = rand_transforms(7, 10)
    pts = rand_points(8, 12)
    for i in range(10):
        a = T.warp_points(ts[i], pts)
        b = T.warp_points_center(ts[i], pts, 0.0, 0.0)
        np.testing.assert_allclose(a, b, atol=EPS)


def test_center_to_ul_matches_center_warp():
    # Warping about the center with the center-pivot transform must equal
    # warping about the origin with the converted transform.
    ts = rand_transforms(21, 10)
    pts = rand_points(22, 12)
    w, h = 128, 96
    for minus_one in (False, True):
        cx = (w - 1) * 0.5 if minus_one else w * 0.5
        cy = (h - 1) * 0.5 if minus_one else h * 0.5
        for i in range(10):
            via_center = T.warp_points_center(ts[i], pts, cx, cy)
            t_ul = T.center_to_ul(ts[i], w, h, minus_one=minus_one)
            via_ul = T.warp_points(t_ul, pts)
            np.testing.assert_allclose(via_center, via_ul, atol=1e-3)


def test_max_corner_displacement():
    # Pure translation: every corner moves exactly |(tx, ty)|.
    t = T.make(0.0, 0.0, 3.0, 4.0)
    d = T.max_corner_displacement(t, 100, 50)
    np.testing.assert_allclose(d, 5.0, atol=1e-4)
    # Identity: zero.
    np.testing.assert_allclose(
        T.max_corner_displacement(T.identity(), 100, 50), 0.0, atol=EPS)
    # Pure rotation about the center moves corners by 2*sin(theta/2)*radius.
    theta = 0.01
    t = T.make(np.cos(theta) - 1.0, np.sin(theta), 0.0, 0.0)
    w, h = 100, 50
    radius = np.hypot(w / 2, h / 2)
    expect = 2 * np.sin(theta / 2) * radius
    np.testing.assert_allclose(
        T.max_corner_displacement(t, w, h), expect, rtol=1e-3)


def test_batched_broadcasting():
    ts = rand_transforms(31, 16)
    pts = rand_points(32, 16)
    # (16, 4) transforms against (16, 2) points, elementwise over the batch.
    out = T.warp_points(ts, pts)
    assert out.shape == (16, 2)
    for i in range(16):
        np.testing.assert_allclose(
            out[i], T.warp_points(ts[i], pts[i]), atol=EPS)


def test_to_affine_matrix_matches_warp():
    ts = rand_transforms(41, 5)
    pts = rand_points(42, 7)
    w, h = 64, 48
    for i in range(5):
        M = np.asarray(T.to_affine_matrix(ts[i], w, h))
        cx, cy = (w - 1) * 0.5, (h - 1) * 0.5
        expect = np.asarray(T.warp_points_center(ts[i], pts, cx, cy))
        p = np.concatenate([np.asarray(pts), np.ones((7, 1), np.float32)], -1)
        got = p @ M.T
        np.testing.assert_allclose(got, expect, atol=1e-3)
