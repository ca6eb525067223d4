"""Gaussian pyramid downsample.

Reference: the ``pyr_down`` Halide generator (generators.cpp:56-120) —
separable 5-tap Gaussian [1,4,6,4,1]/16 in Y then X with repeat-edge boundary,
then 2x decimation: ``output(x, y) = u8(blur_xy(2x, 2y))``.

TPU-native formulation: because only every other output pixel of the blur is
kept, the whole kernel collapses to

    out[y, x] = sum_{i,j} c_i c_j padded[2y + i, 2x + j]

i.e. a 5x5 separable stride-2 stencil. We express it as two strided-slice
weighted sums, which XLA fuses into a single VPU pass — no gathers, no convs
with 1-channel MXU waste. Batched over arbitrary leading axes so whole frame
stacks / multi-stream batches downsample in one fused kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

# [1, 4, 6, 4, 1] / 16 (generators.cpp:68)
_COEFFS = (1.0 / 16, 4.0 / 16, 6.0 / 16, 4.0 / 16, 1.0 / 16)
_COEFFS_INT = (1, 4, 6, 4, 1)


def pyr_down(img, out_dtype=jnp.uint8):
    """Downsample by 2x with a 5-tap Gaussian, repeat-edge boundary.

    For u8 inputs this runs in exact int32 fixed point: the reference's f32
    path is exact dyadic arithmetic (products of k/16 values, sums < 2^24),
    so floor(sum / 256) is BIT-IDENTICAL to the Halide kernel's truncating
    cast (generators.cpp:91) while skipping the f32 round trip.

    Args:
      img: (..., H, W) uint8 (or float) image(s).
    Returns:
      (..., H//2, W//2) image(s) of ``out_dtype``.
    """
    h, w = img.shape[-2], img.shape[-1]
    h2, w2 = h // 2, w // 2
    pad = [(0, 0)] * (img.ndim - 2) + [(2, 2), (2, 2)]

    if img.dtype == jnp.uint8 and jnp.issubdtype(jnp.dtype(out_dtype),
                                                 jnp.integer):
        x = jnp.pad(img, pad, mode="edge").astype(jnp.int32)
        rowblur = sum(
            c * x[..., i : i + 2 * h2 : 2, :]
            for i, c in enumerate(_COEFFS_INT))
        out = sum(
            c * rowblur[..., :, j : j + 2 * w2 : 2]
            for j, c in enumerate(_COEFFS_INT))
        return (out // 256).astype(out_dtype)

    x = jnp.pad(img.astype(jnp.float32), pad, mode="edge")
    rowblur = sum(
        c * x[..., i : i + 2 * h2 : 2, :] for i, c in enumerate(_COEFFS))
    out = sum(
        c * rowblur[..., :, j : j + 2 * w2 : 2] for j, c in enumerate(_COEFFS))
    return out.astype(out_dtype)


def build_pyramid(frame, num_levels):
    """Build the full grayscale pyramid for one (batch of) frame(s).

    Level 0 is the input itself (alignment.cpp:217); each subsequent level is
    pyr_down of the previous (alignment.cpp:220-223).

    Returns a list of ``num_levels`` arrays.
    """
    levels = [frame]
    for _ in range(num_levels - 1):
        levels.append(pyr_down(levels[-1]))
    return levels
