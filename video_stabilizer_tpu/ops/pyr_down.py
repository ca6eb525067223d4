"""Gaussian pyramid downsample.

Reference: the ``pyr_down`` Halide generator (generators.cpp:56-120) —
separable 5-tap Gaussian [1,4,6,4,1]/16 in Y then X with repeat-edge boundary,
then 2x decimation: ``output(x, y) = u8(blur_xy(2x, 2y))``.

TPU-native formulation: because only every other output pixel of the blur is
kept, the whole kernel collapses to

    out[y, x] = sum_{i,j} c_i c_j padded[2y + i, 2x + j]

i.e. a 5x5 separable stride-2 stencil. Expressing BOTH passes as stride-2
slices is hostile on TPU: stride-2 access on the LANE axis forces
register-tile shuffles that ran ~10x off bandwidth (profiled: the pyramid
was the single largest align component at 1080p). So the lane-axis pass is
a BANDED DECIMATION MATMUL on the MXU,

    tmp = padded . D,   D[2k + j, k] = c_j  (j in 0..4),

with bf16 operands and f32 accumulation, and only the benign SUBLANE axis
uses stride-2 slices (f32 VPU adds). Every quantity is exact: the taps
k/16 are dyadic (exact bf16), u8 pixels are exact bf16, each MXU product
has <= 16 mantissa bits (exact f32), the row pass is pure f32 arithmetic
on dyadic values < 2^16 — so the result equals the reference's float blur
bit-for-bit and the truncating u8 cast matches Halide's
(generators.cpp:91). The decimation matrix is built from iotas in-graph
and hoisted as a loop invariant of the frame scans. Batched over arbitrary
leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp

# [1, 4, 6, 4, 1] / 16 (generators.cpp:68)
_COEFFS = (1.0 / 16, 4.0 / 16, 6.0 / 16, 4.0 / 16, 1.0 / 16)


def _decim_matrix(n_padded: int, n_out: int, dtype):
    """(n_padded, n_out) banded matrix D[2k + j, k] = c_j (j in 0..4)."""
    rows = jnp.arange(n_padded, dtype=jnp.int32)[:, None]
    cols = jnp.arange(n_out, dtype=jnp.int32)[None, :]
    d = rows - 2 * cols
    m = jnp.zeros((n_padded, n_out), jnp.float32)
    for j, c in enumerate(_COEFFS):
        m = m + jnp.where(d == j, jnp.float32(c), 0.0)
    return m.astype(dtype)


def pyr_down(img, out_dtype=jnp.uint8):
    """Downsample by 2x with a 5-tap Gaussian, repeat-edge boundary.

    Bit-identical to the reference kernel's truncating u8 cast (see module
    docstring for the exactness argument).

    Args:
      img: (..., H, W) uint8 (or float) image(s).
    Returns:
      (..., H//2, W//2) image(s) of ``out_dtype``.
    """
    h, w = img.shape[-2], img.shape[-1]
    h2, w2 = h // 2, w // 2
    pad = [(0, 0)] * (img.ndim - 2) + [(2, 2), (2, 2)]

    exact_u8 = img.dtype == jnp.uint8
    op_dtype = jnp.bfloat16 if exact_u8 else jnp.float32
    x = jnp.pad(img, pad, mode="edge").astype(op_dtype)
    # Lane (x) pass on the MXU: contract the padded-column axis.
    dx = _decim_matrix(w + 4, w2, op_dtype)
    tmp = jnp.einsum("...yj,jx->...yx", x, dx,
                     preferred_element_type=jnp.float32)
    # Sublane (y) pass: stride-2 row slices, exact f32 adds.
    out = sum(c * tmp[..., i : i + 2 * h2 : 2, :]
              for i, c in enumerate(_COEFFS))
    # For u8: truncating cast, matching Halide's u8(blur) (values are
    # exact dyadic rationals in [0, 255.94]).
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
