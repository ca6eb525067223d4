"""8-DOF homography transform algebra (the extended motion model).

The reference is strictly 4-DOF similarity (imgproc.hpp:40-46); the
north-star configs additionally call for a "full 8-DOF homography model"
(BASELINE.json config 4). This module provides the projective group in the
same array style as transforms.py: a homography is an (..., 8) array
``p`` with

    H(p) = [[1+p0, p1,   p2 ],
            [p3,   1+p4, p5 ],
            [p6,   p7,   1  ]]

acting on *centered, width-normalized* coordinates u = (x - cx)/s,
v = (y - cy)/s with s = width (the same conditioning trick as the
reference's 1/width-normalized A/B rows, generators.cpp:355). Zeros are
the identity, and because coordinates are scene-normalized, the SAME
parameter vector is valid at every pyramid level — no per-level TX/TY
rescaling.
"""

from __future__ import annotations

import jax.numpy as jnp


def identity(dtype=jnp.float32, batch_shape=()):
    return jnp.zeros(batch_shape + (8,), dtype)


def to_matrix(p):
    """(..., 8) -> (..., 3, 3) with H[2,2] = 1."""
    one = jnp.ones_like(p[..., 0])
    row0 = jnp.stack([1.0 + p[..., 0], p[..., 1], p[..., 2]], -1)
    row1 = jnp.stack([p[..., 3], 1.0 + p[..., 4], p[..., 5]], -1)
    row2 = jnp.stack([p[..., 6], p[..., 7], one], -1)
    return jnp.stack([row0, row1, row2], -2)


def from_matrix(m):
    """(..., 3, 3) -> (..., 8), normalizing H[2,2] to 1."""
    m = m / m[..., 2:3, 2:3]
    return jnp.stack([
        m[..., 0, 0] - 1.0, m[..., 0, 1], m[..., 0, 2],
        m[..., 1, 0], m[..., 1, 1] - 1.0, m[..., 1, 2],
        m[..., 2, 0], m[..., 2, 1],
    ], -1)


def warp_norm(p, uv):
    """Warp centered-normalized points. uv: (..., 2) -> (..., 2)."""
    u, v = uv[..., 0], uv[..., 1]
    num_x = (1.0 + p[..., 0]) * u + p[..., 1] * v + p[..., 2]
    num_y = p[..., 3] * u + (1.0 + p[..., 4]) * v + p[..., 5]
    den = p[..., 6] * u + p[..., 7] * v + 1.0
    return jnp.stack([num_x / den, num_y / den], -1)


def norm_coords(xy, width, height):
    """Pixel -> centered width-normalized coordinates."""
    s = 1.0 / width
    cx, cy = width * 0.5, height * 0.5
    return jnp.stack([(xy[..., 0] - cx) * s, (xy[..., 1] - cy) * s], -1)


def denorm_coords(uv, width, height):
    cx, cy = width * 0.5, height * 0.5
    return jnp.stack([uv[..., 0] * width + cx, uv[..., 1] * width + cy], -1)


def warp_points(p, xy, width, height):
    """Warp pixel-coordinate points (about the W*0.5 center)."""
    return denorm_coords(warp_norm(p, norm_coords(xy, width, height)),
                         width, height)


def compose(p1, p2):
    """Apply p1 first, then p2 (same convention as transforms.compose)."""
    return from_matrix(to_matrix(p2) @ to_matrix(p1))


def inverse(p):
    return from_matrix(jnp.linalg.inv(to_matrix(p)))


def sim_to_homography(t, width, height):
    """Embed a similarity transform (..., 4) [A,B,TX,TY] (center-pivot,
    W*0.5 convention) into the normalized homography parameterization."""
    a, b = t[..., 0], t[..., 1]
    s = 1.0 / width
    zero = jnp.zeros_like(a)
    return jnp.stack([a, -b, t[..., 2] * s, b, a, t[..., 3] * s,
                      zero, zero], -1)


def max_corner_displacement(p, width, height):
    corners = jnp.asarray(
        [[0.0, 0.0], [width, 0.0], [0.0, height], [width, height]],
        p.dtype)
    warped = warp_points(p[..., None, :], corners, width, height)
    return jnp.max(jnp.linalg.norm(warped - corners, axis=-1), axis=-1)


def jacobian_rows(u, v):
    """d(warped u, v)/d(p) at p = 0 for normalized coords (u, v):
    dWu/dp = [u, v, 1, 0, 0, 0, -u^2, -uv],
    dWv/dp = [0, 0, 0, u, v, 1, -uv, -v^2].

    Returns (ju, jv): each (..., 8)."""
    one = jnp.ones_like(u)
    zero = jnp.zeros_like(u)
    ju = jnp.stack([u, v, one, zero, zero, zero, -u * u, -u * v], -1)
    jv = jnp.stack([zero, zero, zero, u, v, one, -u * v, -v * v], -1)
    return ju, jv
