"""The sparse inverse-compositional LK kernel chain.

Replaces the reference's ``sparse_jac`` / ``sparse_warpdiff`` / ``sparse_ica``
Halide generators (generators.cpp:332-423, 646-739, 429-640) with dense,
statically-shaped XLA programs over the (Ht, Wt) tile grid:

- Jacobian rows and template values are extracted with per-tile
  ``take_along_axis`` — no image-level gathers at all (see ops/argmax.py).
- The only true random access is sampling the keyframe at *warped* positions
  (5x5 Lanczos2 patches); that is one XLA gather of (Ht*Wt, 5, 5) elements.
- Outlier rejection ("keep smallest 80% by |warp diff|",
  alignment.cpp:460-492) becomes a 0/1 mask over the tile grid, so the
  Gauss-Newton Hessian and RHS are plain masked reductions — shapes never
  depend on data.

Numerics note: the reference accumulates the ICA RHS in f64
(generators.cpp:546-595). TPU f64 is emulated and slow; here the reduction is
f32 with XLA's tree reduction (error ~log2(N)*eps), validated against an f64
numpy oracle in tests/test_kernels.py. The implicit 1/4 GN step damping is
replicated exactly: J rows carry a factor 2 (generators.cpp:369-384) and the
ICA output is halved by the X/Y-set average (generators.cpp:595).
"""

from __future__ import annotations

import jax.numpy as jnp

from video_stabilizer_tpu.ops.lanczos import lanczos2_weights_5tap


def sparse_jacobian(gval_x, gval_y, coords_x, coords_y, width, height,
                    dtype=jnp.float32):
    """Per-keypoint 4-vector steepest-descent rows (generators.cpp:332-423).

    X-selected pixels use only grad_x; Y-selected only grad_y. (u, v) is the
    offset from the image center (cx = W*0.5, cy = H*0.5,
    generators.cpp:352-353); A/B rows are normalized by 1/width
    (generators.cpp:355) and all rows carry the reference's factor 2.

    Args:
      gval_x: (..., Ht, Wt) grad_x at the X-argmax pixels
        (= take_at_tile_argmax(grad_x, idx_x)).
      gval_y: (..., Ht, Wt) grad_y at the Y-argmax pixels.
      coords_x, coords_y: (..., Ht, Wt, 2) absolute (x, y) int coords.
      width, height: static ints of the gradient image.

    Returns:
      (jac_x, jac_y): each (..., Ht, Wt, 4) ``dtype``.
    """
    cx = width * 0.5
    cy = height * 0.5
    scale = 1.0 / width

    def rows(gval, coords, is_x):
        g = gval.astype(dtype)
        u = coords[..., 0].astype(dtype) - cx
        v = coords[..., 1].astype(dtype) - cy
        zero = jnp.zeros_like(g)
        if is_x:
            # dI/dA, dI/dB, dI/dTX, dI/dTY (generators.cpp:368-373)
            return jnp.stack(
                [2.0 * g * u * scale, 2.0 * g * (-v) * scale, 2.0 * g, zero],
                axis=-1)
        # (generators.cpp:380-385)
        return jnp.stack(
            [2.0 * g * v * scale, 2.0 * g * u * scale, zero, 2.0 * g],
            axis=-1)

    return rows(gval_x, coords_x, True), rows(gval_y, coords_y, False)


def sparse_warp_sample(keyframe, coords, t_ul):
    """Lanczos2-resample ``keyframe`` at the warped positions of ``coords``.

    The shared warp machinery of sparse_ica and sparse_warpdiff
    (generators.cpp:459-498, 663-697): warp each integer keypoint coordinate
    by the origin-based transform, then take a weight-normalized 5x5
    Lanczos2 sample with repeat-edge boundary.

    Args:
      keyframe: (H, W) u8 image (2D — batched callers vmap).
      coords: (..., 2) int (x, y) keypoint coordinates.
      t_ul: (4,) origin-based transform (use transforms.center_to_ul with the
        W*0.5 convention, imgproc.cpp:72-75).

    Returns:
      (...,) float32 warped intensities.
    """
    h, w = keyframe.shape[-2], keyframe.shape[-1]
    dtype = jnp.float32
    ox = coords[..., 0].astype(dtype)
    oy = coords[..., 1].astype(dtype)
    a, b, tx, ty = t_ul[0], t_ul[1], t_ul[2], t_ul[3]
    wx = (1.0 + a) * ox - b * oy + tx
    wy = b * ox + (1.0 + a) * oy + ty

    x0f = jnp.floor(wx)
    y0f = jnp.floor(wy)
    weights_x = lanczos2_weights_5tap(wx - x0f)  # (..., 5)
    weights_y = lanczos2_weights_5tap(wy - y0f)

    offs = jnp.arange(-2, 3, dtype=jnp.int32)
    xs = jnp.clip(x0f.astype(jnp.int32)[..., None] + offs, 0, w - 1)
    ys = jnp.clip(y0f.astype(jnp.int32)[..., None] + offs, 0, h - 1)
    patch = keyframe[ys[..., :, None], xs[..., None, :]].astype(dtype)  # (..., 5, 5)

    w2d = weights_y[..., :, None] * weights_x[..., None, :]
    num = jnp.sum(w2d * patch, axis=(-2, -1))
    den = jnp.sum(w2d, axis=(-2, -1))
    return num / den


def sparse_warpdiff(template_vals, keyframe, coords, t_ul):
    """|warped keyframe - template| per keypoint (generators.cpp:646-739).

    The robustness signal used for outlier / moving-object rejection. The
    reference emits u16(clamp(diff)); we keep float32 — the selection
    quantile/top-k operates on the same ordering (truncation-to-u16 binning
    only reshuffles exact ties, which the reference breaks arbitrarily too).

    Args:
      template_vals: (..., Ht, Wt) template intensities at the keypoints
        (= take_at_tile_argmax(template, idx)).
      keyframe: (H, W) u8.
      coords: (..., Ht, Wt, 2) int coords.
      t_ul: (4,) origin-based transform.
    Returns:
      (..., Ht, Wt) float32 absolute differences.
    """
    warped = sparse_warp_sample(keyframe, coords, t_ul)
    return jnp.abs(warped - template_vals.astype(jnp.float32))


def sparse_ica(template_vals_x, template_vals_y, keyframe,
               coords_x, coords_y, jac_x, jac_y, mask_x, mask_y, t_ul,
               dtype=jnp.float32):
    """Gauss-Newton RHS b = mean-of-sets sum(J^T (template - warped)).

    Reference: generators.cpp:429-640. The X and Y keypoint sets are reduced
    separately and averaged: out = (rx + ry) * 0.5 (generators.cpp:595).
    Selection masks implement the reference's nth_element subset
    (alignment.cpp:460-546) as 0/1 weights.

    Args:
      template_vals_*: (Ht, Wt) template intensities at keypoints.
      keyframe: (H, W) u8.
      coords_*: (Ht, Wt, 2) int coords.
      jac_*: (Ht, Wt, 4) Jacobian rows.
      mask_*: (Ht, Wt) 0/1 selection weights.
      t_ul: (4,) origin-based transform.
    Returns:
      (4,) ``dtype`` RHS vector.
    """
    def reduce_set(template_vals, coords, jac, mask):
        warped = sparse_warp_sample(keyframe, coords, t_ul)
        residual = (template_vals.astype(jnp.float32) - warped) * mask
        return jnp.einsum("hwc,hw->c", jac.astype(dtype),
                          residual.astype(dtype))

    rx = reduce_set(template_vals_x, coords_x, jac_x, mask_x)
    ry = reduce_set(template_vals_y, coords_y, jac_y, mask_y)
    return (rx + ry) * 0.5


# --------------------------------------------------------------------------
# Gather-free window-based variants (the TPU fast path — see ops/patches.py).
# The gather-based versions above are the semantic oracles; the window
# variants are tested against them in test_kernels.py.
# --------------------------------------------------------------------------

from video_stabilizer_tpu.ops.patches import (  # noqa: E402
    sample_windows,
    warp_rel_positions,
)


def sparse_warpdiff_windows(template_vals, windows, coords, t_ul, ox, oy):
    """|warped - template| per keypoint, sampling from pre-extracted
    keyframe windows instead of gathering from the image."""
    p = windows.shape[-1]
    rel_x, rel_y = warp_rel_positions(coords, t_ul, ox, oy, p)
    warped = sample_windows(windows, rel_x, rel_y)
    return jnp.abs(warped - template_vals.astype(jnp.float32))


def sparse_ica_windows(template_vals_x, template_vals_y, windows,
                       coords_x, coords_y, jac_x, jac_y, mask_x, mask_y,
                       t_ul, ox, oy, dtype=jnp.float32):
    """Gauss-Newton RHS from pre-extracted keyframe windows. Zero gathers:
    the GN inner loop is batched small matvecs only."""
    p = windows.shape[-1]

    def reduce_set(template_vals, coords, jac, mask):
        rel_x, rel_y = warp_rel_positions(coords, t_ul, ox, oy, p)
        warped = sample_windows(windows, rel_x, rel_y)
        residual = (template_vals.astype(jnp.float32) - warped) * mask
        return jnp.einsum("hwc,hw->c", jac.astype(dtype),
                          residual.astype(dtype))

    rx = reduce_set(template_vals_x, coords_x, jac_x, mask_x)
    ry = reduce_set(template_vals_y, coords_y, jac_y, mask_y)
    return (rx + ry) * 0.5
