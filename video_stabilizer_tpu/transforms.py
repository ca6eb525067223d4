"""Similarity-transform algebra as pure JAX array ops.

The 4-parameter similarity transform is the motion model of the whole
framework (reference: imgproc.hpp:40-65):

    W(x, y) = ((1 + A) * x - B * y + TX,
               B * x + (1 + A) * y + TY)

so ``(A=0, B=0, TX=0, TY=0)`` is the identity. Upper-left corner is (0, 0),
+x right, +y down, units are pixels.

A transform is represented as an array of shape ``(..., 4)`` holding
``[A, B, TX, TY]``. Every function broadcasts over leading axes, so the whole
algebra is trivially ``vmap``-able / shardable over batches of streams,
frames, or hyperparameter combos.

Reference semantics reproduced here (with file:line citations into
/root/reference):
  - ``inverse``:   imgproc.cpp:333-359 (exact closed form)
  - ``compose``:   imgproc.cpp:361-387 (t1.compose(t2) == "apply t1 then t2")
  - ``warp``:      imgproc.cpp:389-411 (origin- and center-pivot overloads)
  - ``max_corner_displacement``: imgproc.cpp:419-437
"""

from __future__ import annotations

import jax.numpy as jnp

# Parameter indices into the (..., 4) layout.
A, B, TX, TY = 0, 1, 2, 3


def identity(dtype=jnp.float32, batch_shape=()):
    """The identity transform: zeros of shape ``batch_shape + (4,)``."""
    return jnp.zeros(batch_shape + (4,), dtype=dtype)


def make(a=0.0, b=0.0, tx=0.0, ty=0.0, dtype=jnp.float32):
    """Build a transform array from scalars (host convenience)."""
    return jnp.asarray(jnp.stack([jnp.asarray(a, dtype), jnp.asarray(b, dtype),
                                  jnp.asarray(tx, dtype), jnp.asarray(ty, dtype)], axis=-1))


def warp_points(t, xy):
    """Warp points by ``t`` about the origin.

    Reference: imgproc.cpp:389-394.

    Args:
      t:  (..., 4) transform.
      xy: (..., 2) points; broadcasts against ``t``.

    Returns:
      (..., 2) warped points.
    """
    a, b = t[..., A], t[..., B]
    x, y = xy[..., 0], xy[..., 1]
    wx = (1.0 + a) * x - b * y + t[..., TX]
    wy = b * x + (1.0 + a) * y + t[..., TY]
    return jnp.stack([wx, wy], axis=-1)


def warp_points_center(t, xy, cx, cy):
    """Warp points by ``t`` with rotation/scale pivoting about (cx, cy).

    Reference: imgproc.cpp:401-411 — translate to center, apply rotation and
    scale, translate back, then translate by (TX, TY).
    """
    a, b = t[..., A], t[..., B]
    px = xy[..., 0] - cx
    py = xy[..., 1] - cy
    wx = (1.0 + a) * px - b * py + cx + t[..., TX]
    wy = b * px + (1.0 + a) * py + cy + t[..., TY]
    return jnp.stack([wx, wy], axis=-1)


def inverse(t):
    """Exact closed-form inverse. Reference: imgproc.cpp:333-359.

    Forward matrix is M = [[p, -q], [q, p]] with p = 1+A, q = B. In the
    center-pivot parameterization the translation is applied after rotation,
    so the inverse applies the inverse rotation to -t.
    """
    p = 1.0 + t[..., A]
    q = t[..., B]
    denom = p * p + q * q
    a_inv = p / denom - 1.0
    b_inv = -q / denom
    tx_inv = (-p * t[..., TX] - q * t[..., TY]) / denom
    ty_inv = (q * t[..., TX] - p * t[..., TY]) / denom
    return jnp.stack([a_inv, b_inv, tx_inv, ty_inv], axis=-1)


def compose(t1, t2):
    """T3 = T2 ∘ T1, i.e. ``T3(p) = T2(T1(p))`` — apply t1 first, then t2.

    Matches ``t1.compose(t2)`` in the reference (imgproc.cpp:361-387).
    """
    p1 = 1.0 + t1[..., A]
    q1 = t1[..., B]
    p2 = 1.0 + t2[..., A]
    q2 = t2[..., B]
    a3 = p2 * p1 - q2 * q1 - 1.0
    b3 = p2 * q1 + q2 * p1
    tx3 = p2 * t1[..., TX] - q2 * t1[..., TY] + t2[..., TX]
    ty3 = q2 * t1[..., TX] + p2 * t1[..., TY] + t2[..., TY]
    return jnp.stack([a3, b3, tx3, ty3], axis=-1)


def corner_points(width, height, dtype=jnp.float32):
    """The four image corners used by the displacement metric
    (imgproc.cpp:424-427): (0,0), (w,0), (0,h), (w,h)."""
    w = jnp.asarray(width, dtype)
    h = jnp.asarray(height, dtype)
    z = jnp.zeros_like(w)
    return jnp.stack(
        [jnp.stack([z, z], -1), jnp.stack([w, z], -1),
         jnp.stack([z, h], -1), jnp.stack([w, h], -1)], axis=-2)  # (..., 4, 2)


def max_corner_displacement(t, width, height):
    """Max distance any image corner moves under ``t`` pivoted about the
    image center. Reference: imgproc.cpp:419-437 (cx = width*0.5 — note this
    is the *non*-minus-one center convention).

    This is the convergence metric of the GN loop and the trigger for the
    stabilizer's displacement-based decay.
    """
    corners = corner_points(width, height, t.dtype)          # (..., 4, 2)
    cx = jnp.asarray(width, t.dtype) * 0.5
    cy = jnp.asarray(height, t.dtype) * 0.5
    warped = warp_points_center(t[..., None, :], corners, cx, cy)
    d = jnp.linalg.norm(warped - corners, axis=-1)           # (..., 4)
    return jnp.max(d, axis=-1)


def center_to_ul(t, width, height, minus_one=False):
    """Convert center-pivot (TX, TY) to the origin-based translation expected
    by the raw warp kernels.

    The reference has *two* center conventions, replicated exactly:
      - SparseICA / SparseWarpDiff use cx = W*0.5        (imgproc.cpp:72-75, 100-103)
      - ImageWarp / warpBySimilarityTransform use cx = (W-1)*0.5
                                                          (imgproc.cpp:125-131, 458-462)

    Pass ``minus_one=True`` for the latter. Returns a new (..., 4) transform
    whose TX/TY are origin-based (A, B unchanged).
    """
    if minus_one:
        cx = (width - 1) * 0.5
        cy = (height - 1) * 0.5
    else:
        cx = width * 0.5
        cy = height * 0.5
    a, b = t[..., A], t[..., B]
    tx_ul = t[..., TX] - a * cx + b * cy
    ty_ul = t[..., TY] - b * cx - a * cy
    return jnp.stack([a, b, tx_ul, ty_ul], axis=-1)


def to_affine_matrix(t, width=None, height=None, minus_one=True):
    """2x3 forward affine matrix [[1+A, -B, tx], [B, 1+A, ty]].

    If width/height are given, TX/TY are first converted from center-based to
    origin-based (matching warpBySimilarityTransform, imgproc.cpp:446-467).
    """
    if width is not None:
        t = center_to_ul(t, width, height, minus_one=minus_one)
    a, b = t[..., A], t[..., B]
    row0 = jnp.stack([1.0 + a, -b, t[..., TX]], axis=-1)
    row1 = jnp.stack([b, 1.0 + a, t[..., TY]], axis=-1)
    return jnp.stack([row0, row1], axis=-2)  # (..., 2, 3)
