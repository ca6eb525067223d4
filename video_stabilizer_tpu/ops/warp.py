"""Dense whole-image warps.

Two kernels:

- ``image_warp_ul`` / ``image_warp``: the reference's ``image_warp`` Halide
  generator (generators.cpp:126-196) — backward-sampling bilinear warp with
  repeat-edge boundary, u8 -> f32. The wrapper converts center-pivot TX/TY to
  origin-based with the (W-1)/2 convention (imgproc.cpp:125-131).

- ``warp_image_bgr`` / ``warp_by_similarity_transform``: the output-stage
  color warp. The reference used OpenCV ``cv::warpAffine`` INTER_LINEAR with
  BORDER_CONSTANT(0) here (imgproc.cpp:446-484); the north star asks for a
  real batched BGR warp kernel, provided here with bilinear (reference
  parity) and Lanczos2 interpolation, batched over streams and channels.

Note on direction: cv::warpAffine *without* WARP_INVERSE_MAP (the reference's
actual call — the flag is commented out at imgproc.cpp:472) treats M as the
forward map and inverts it internally, so the net effect of
``warpBySimilarityTransform(src, T)`` is ``dst(p) = src(T^-1(p))``.
``warp_by_similarity_transform`` replicates that exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from video_stabilizer_tpu import transforms
from video_stabilizer_tpu.ops.lanczos import lanczos2_weights_5tap


def _warp_coords(t_ul, height, width, dtype=jnp.float32):
    """Backward-sample coordinates W(p) for every output pixel.

    t_ul: (..., 4) origin-based transform. Returns (wx, wy), each
    (..., H, W).
    """
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    x = xs[None, :]
    y = ys[:, None]
    a = t_ul[..., 0, None, None]
    b = t_ul[..., 1, None, None]
    tx = t_ul[..., 2, None, None]
    ty = t_ul[..., 3, None, None]
    wx = (1.0 + a) * x - b * y + tx
    wy = b * x + (1.0 + a) * y + ty
    return wx, wy


def _bilinear_sample(img_f, wx, wy, border):
    """Bilinear sample of (..., H, W) float image at (wx, wy).

    border: "edge" (clamp, = Halide repeat_edge) or "zero" (constant 0,
    = cv::BORDER_CONSTANT).
    """
    h, w = img_f.shape[-2], img_f.shape[-1]
    x0f = jnp.floor(wx)
    y0f = jnp.floor(wy)
    fx = wx - x0f
    fy = wy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    # img_f is always 2D here; batched images vmap at the call site.
    def sample(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        v = img_f[yc, xc]
        if border == "zero":
            inside = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
            v = jnp.where(inside, v, 0.0)
        return v

    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)
    top = v00 + (v01 - v00) * fx
    bot = v10 + (v11 - v10) * fx
    return top + (bot - top) * fy


def _lanczos_sample(img_f, wx, wy, border):
    """Weight-normalized 5x5 Lanczos2 sample of a 2D float image."""
    h, w = img_f.shape[-2], img_f.shape[-1]
    x0f = jnp.floor(wx)
    y0f = jnp.floor(wy)
    weights_x = lanczos2_weights_5tap(wx - x0f)  # (..., 5)
    weights_y = lanczos2_weights_5tap(wy - y0f)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    offs = jnp.arange(-2, 3, dtype=jnp.int32)
    ys = y0[..., None] + offs                      # (..., 5)
    xs = x0[..., None] + offs
    yc = jnp.clip(ys, 0, h - 1)
    xc = jnp.clip(xs, 0, w - 1)
    patch = img_f[yc[..., :, None], xc[..., None, :]]  # (..., 5, 5)
    w2d = weights_y[..., :, None] * weights_x[..., None, :]
    if border == "zero":
        inside = ((ys[..., :, None] >= 0) & (ys[..., :, None] <= h - 1)
                  & (xs[..., None, :] >= 0) & (xs[..., None, :] <= w - 1))
        patch = jnp.where(inside, patch, 0.0)
    num = jnp.sum(w2d * patch, axis=(-2, -1))
    den = jnp.sum(w2d, axis=(-2, -1))
    return num / den


def image_warp_ul(img, t_ul, out_dtype=jnp.float32):
    """Raw warp kernel: output(p) = bilinear(input, W(p)), repeat-edge.

    Matches the ``image_warp`` generator (generators.cpp:139-163) exactly:
    the transform is origin-based.

    Args:
      img: (H, W) u8 image.
      t_ul: (4,) origin-based transform.
    Returns:
      (H, W) float32 image.
    """
    h, w = img.shape[-2], img.shape[-1]
    wx, wy = _warp_coords(t_ul, h, w)
    return _bilinear_sample(img.astype(jnp.float32), wx, wy, "edge").astype(out_dtype)


def image_warp(img, t_center, out_dtype=jnp.float32):
    """Center-pivot wrapper, (W-1)/2 convention (imgproc.cpp:116-133)."""
    h, w = img.shape[-2], img.shape[-1]
    t_ul = transforms.center_to_ul(t_center, w, h, minus_one=True)
    return image_warp_ul(img, t_ul, out_dtype=out_dtype)


def warp_image_bgr(img, t_sample_ul, interp="bilinear", border="zero",
                   out_dtype=jnp.uint8):
    """Batched color warp: dst(p) = interp(src, T_sample(p)).

    The TPU-native replacement for the reference's OpenCV color warp
    (imgproc.cpp:446-484) and the north-star ``bgr_image_warp``.

    Args:
      img: (H, W) or (H, W, C) u8 image.
      t_sample_ul: (4,) origin-based *sampling* transform (i.e. the inverse
        of the displayed motion).
      interp: "bilinear" (reference parity) or "lanczos2".
      border: "zero" (cv::BORDER_CONSTANT parity) or "edge".
    Returns:
      warped image, same shape, ``out_dtype`` (u8 values are clipped then
      rounded half-away like OpenCV's saturate_cast).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    wx, wy = _warp_coords(t_sample_ul, h, w)
    sample = _bilinear_sample if interp == "bilinear" else _lanczos_sample
    chans = [sample(img[..., k].astype(jnp.float32), wx, wy, border)
             for k in range(c)]
    out = jnp.stack(chans, axis=-1)
    if jnp.issubdtype(jnp.dtype(out_dtype), jnp.integer):
        info = jnp.iinfo(out_dtype)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    out = out.astype(out_dtype)
    return out[..., 0] if squeeze else out


def warp_by_similarity_transform(img, t_center, interp="bilinear",
                                 out_dtype=jnp.uint8):
    """Replicates ``warpBySimilarityTransform(src, T)`` (imgproc.cpp:446-484):
    dst(p) = src(T^-1(p)) with T in the center-pivot, (W-1)/2 convention,
    BORDER_CONSTANT(0).
    """
    h, w = img.shape[0], img.shape[1]
    t_ul = transforms.center_to_ul(t_center, w, h, minus_one=True)
    t_sample_ul = transforms.inverse(t_ul)
    return warp_image_bgr(img, t_sample_ul, interp=interp, border="zero",
                          out_dtype=out_dtype)
