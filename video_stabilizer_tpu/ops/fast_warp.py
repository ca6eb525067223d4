"""Gather-free dense similarity warp (the output stage's hot kernel).

An XLA gather at 1080p x 3 channels x 4 bilinear taps costs ~0.8 s/frame on
TPU (measured gather throughput ~30M elem/s) — useless for the >500 fps
target. This kernel restructures the warp into pure VPU arithmetic:

1. The bulk displacement (the warp's translation at the image center) is
   removed with ONE dynamic_slice from a zero-padded copy — static shapes,
   arbitrary magnitude up to the static pad bound.
2. The residual per-pixel displacement (rotation/zoom fringe + subpixel) is
   bounded by ~|A,B| * image_radius + 1 px; the interpolation becomes a
   position-dependent FIR over 2m+2 static shifted slices per axis —
   branchless weighted adds the VPU eats for breakfast.

The two 1-D passes use each pixel's own (wy, wx), so the y-pass weight is
evaluated at the column being read rather than the output column — exact
for pure translation (B=0), and off by O(B * m * |∇I|) intensity (<1 LSB for
stabilization-scale rotations) otherwise. Positions whose residual exceeds
the static bound m clamp to it (visible only under rotations beyond the
design envelope; the displacement-decay keeps real corrections inside it).

Replaces the reference's cv::warpAffine INTER_LINEAR BORDER_CONSTANT output
warp (imgproc.cpp:446-484) and implements the north-star bgr_image_warp
(bilinear or Lanczos2), batched over channels and vmappable over frames.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from video_stabilizer_tpu.ops.lanczos import lanczos2


def _hat(t):
    """Bilinear weight: the unit hat function."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def warp_field_fast(img, wx, wy, interp: str = "bilinear",
                    residual_bound: int = 8, max_shift: int = 192,
                    out_dtype=jnp.uint8):
    """dst(p) = interp(img, (wx(p), wy(p))) with zero border, gather-free.

    Generic over the sample-position fields, so it serves both the
    similarity output warp and the 8-DOF homography model (any smooth
    field whose residual after bulk-translation removal stays within
    ``residual_bound`` works).

    Args:
      img: (H, W) or (H, W, C) u8 (or float) image.
      wx, wy: (H, W) float32 sample positions per output pixel.
      interp: "bilinear" (cv INTER_LINEAR parity) or "lanczos2".
      residual_bound: static bound m on per-pixel displacement after bulk
        translation removal (taps span [-m, m+1]).
      max_shift: static bound on the bulk integer translation (pixels).

    Returns:
      warped image, same shape, ``out_dtype``.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    m = residual_bound
    halo = m + 2  # taps reach floor(r) + 2 at most (lanczos radius)
    f32 = jnp.float32

    # Bulk integer shift = warp displacement at the image center.
    cx, cy = (w - 1) // 2, (h - 1) // 2
    k0x = jnp.clip(jnp.round(wx[cy, cx] - cx),
                   -(max_shift - halo), max_shift - halo).astype(jnp.int32)
    k0y = jnp.clip(jnp.round(wy[cy, cx] - cy),
                   -(max_shift - halo), max_shift - halo).astype(jnp.int32)

    # Zero-padded source; one dynamic_slice re-centers the bulk shift and
    # leaves a halo for the residual taps. (zero border == cv BORDER_CONSTANT)
    # base stays in the input dtype (u8): each tap read converts on the fly,
    # keeping the 2m+2 passes' HBM traffic at 1 byte/px.
    big = jnp.pad(img, ((max_shift, max_shift), (max_shift, max_shift),
                        (0, 0)))
    base = jax.lax.dynamic_slice(
        big, (max_shift + k0y - halo, max_shift + k0x - halo, 0),
        (h + 2 * halo, w + 2 * halo, c))

    # Residual positions; the y-pass output must cover the x-pass taps'
    # columns, so wy is edge-extended by halo columns (exact for
    # x-independent wy; O(d wy/dx * halo) at the borders otherwise).
    ys = jnp.arange(h, dtype=f32)[:, None]
    xs = jnp.arange(w, dtype=f32)[None, :]
    wy_ext = jnp.pad(wy.astype(f32), ((0, 0), (halo, halo)), mode="edge")
    ry_ext = jnp.clip(wy_ext - ys - k0y.astype(f32), -m, m)

    weight = _hat if interp == "bilinear" else lanczos2
    lo = -m - (0 if interp == "bilinear" else 2)
    hi = m + (2 if interp == "bilinear" else 3)

    # Bilinear hat weights sum to exactly 1 within the clamped tap range —
    # skip the normalization accumulators entirely (they cost a full-frame
    # f32 accumulation chain per pass).
    need_den = interp != "bilinear"

    # Y pass: tmp[y, x'] = sum_d weight(ry[y,x'] - d) * base[y + d, x'].
    tmp = jnp.zeros((h, w + 2 * halo, c), f32)
    den_y = jnp.zeros((h, w + 2 * halo), f32) if need_den else None
    for d in range(lo, hi):
        wgt = weight(ry_ext - d)
        tmp = tmp + wgt[..., None] * base[halo + d : halo + d + h, :, :].astype(f32)
        if need_den:
            den_y = den_y + wgt
    # bf16 intermediate halves the x-pass traffic; u8 integers are exact in
    # bf16, so integer translations stay bit-exact and subpixel paths lose
    # <0.5 intensity.
    tmp = tmp.astype(jnp.bfloat16)

    # X pass: out[y, x] = sum_e weight(rx[y,x] - e) * tmp[y, x + e].
    rx = jnp.clip(wx.astype(f32) - xs - k0x.astype(f32), -m, m)
    out = jnp.zeros((h, w, c), f32)
    den_x = jnp.zeros((h, w), f32) if need_den else None
    for e in range(lo, hi):
        wgt = weight(rx - e)
        out = out + wgt[..., None] * tmp[:, halo + e : halo + e + w, :].astype(f32)
        if need_den:
            den_x = den_x + wgt * den_y[:, halo + e : halo + e + w]

    if need_den:
        # lanczos needs the weight-sum normalization like the reference's
        # sum_den (generators.cpp:494-497).
        out = out / jnp.maximum(den_x[..., None] * 1.0, 1e-6)

    if jnp.issubdtype(jnp.dtype(out_dtype), jnp.integer):
        info = jnp.iinfo(out_dtype)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    out = out.astype(out_dtype)
    return out[..., 0] if squeeze else out


def warp_image_fast(img, t_sample_ul, interp: str = "bilinear",
                    residual_bound: int = 8, max_shift: int = 192,
                    out_dtype=jnp.uint8):
    """Similarity-transform wrapper: dst(p) = interp(img, W(p)) with the
    origin-based *sampling* transform ``t_sample_ul`` (4,)."""
    h = img.shape[0]
    w = img.shape[1]
    f32 = jnp.float32
    a, b, tx, ty = (t_sample_ul[i].astype(f32) for i in range(4))
    ys = jnp.arange(h, dtype=f32)[:, None]
    xs = jnp.arange(w, dtype=f32)[None, :]
    wx = (1.0 + a) * xs - b * ys + tx
    wy = b * xs + (1.0 + a) * ys + ty
    return warp_field_fast(img, wx, wy, interp=interp,
                           residual_bound=residual_bound,
                           max_shift=max_shift, out_dtype=out_dtype)


def warp_homography_fast(img, p, interp: str = "bilinear",
                         residual_bound: int = 8, max_shift: int = 192,
                         out_dtype=jnp.uint8):
    """Homography wrapper: ``p`` is the (8,) normalized-parameterization
    sampling homography (see homography.py)."""
    from video_stabilizer_tpu import homography as Hm

    h = img.shape[0]
    w = img.shape[1]
    f32 = jnp.float32
    ys = jnp.arange(h, dtype=f32)
    xs = jnp.arange(w, dtype=f32)
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (H, W, 2)
    warped = Hm.warp_points(p, grid, w, h)
    return warp_field_fast(img, warped[..., 0], warped[..., 1], interp=interp,
                           residual_bound=residual_bound,
                           max_shift=max_shift, out_dtype=out_dtype)
