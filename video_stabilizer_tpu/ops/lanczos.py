"""Lanczos2 resampling window.

The reference replaced sinc(x)*sinc(x/2) with a degree-12 even polynomial
(Horner on x^2) fit offline by lanczos2_opt.cpp — 2.7x faster on CPU with
max abs error 3.84e-4 on [-2, 2] (generators.cpp:31-47, lanczos2_opt.cpp:366-388).
On TPU the polynomial is likewise the right call: 7 FMAs on the VPU vs. two
transcendental sin evaluations. The coefficients below are the reference's
published fit results (generators.cpp:38-44).
"""

from __future__ import annotations

import jax.numpy as jnp

# Even-polynomial coefficients a0..a6 for P(x) = sum a_k * x^(2k),
# from the offline least-squares fit (generators.cpp:38-44).
_POLY_COEFFS = (
    0.999861,    # a0
    -2.05238,    # a1
    1.52229,     # a2
    -0.583468,   # a3
    0.128693,    # a4
    -0.0158853,  # a5
    0.000858519, # a6
)


def lanczos2(x):
    """Polynomial Lanczos2 window, zero for |x| >= 2 (generators.cpp:31-47)."""
    x = jnp.asarray(x)
    x2 = x * x
    val = jnp.asarray(_POLY_COEFFS[6], x.dtype)
    for a in _POLY_COEFFS[5::-1]:
        val = jnp.asarray(a, x.dtype) + val * x2
    return jnp.where(jnp.abs(x) >= 2.0, jnp.zeros((), x.dtype), val)


def lanczos2_exact(x):
    """Exact sinc(x)*sinc(x/2) baseline (generators.cpp:5-27), for tests."""
    x = jnp.asarray(x, jnp.float32)

    def sinc(v):
        pix = v * jnp.pi
        s = jnp.sin(pix) / jnp.where(pix == 0.0, 1.0, pix)
        return jnp.where(v == 0.0, 1.0, s)

    val = sinc(x) * sinc(x / 2.0)
    return jnp.where(jnp.abs(x) >= 2.0, 0.0, val)


def lanczos2_weights_5tap(frac):
    """The five 1D Lanczos2 tap weights used by the sparse warp kernels.

    For a sample at integer_base + frac, tap u in [0..4] sits at offset
    (u - 2) - frac from the sample point (generators.cpp:479-484).

    Args:
      frac: (...,) fractional parts in [0, 1).
    Returns:
      (..., 5) weights.
    """
    frac = jnp.asarray(frac)
    offsets = jnp.arange(-2, 3, dtype=frac.dtype)  # u - 2 for u in 0..4
    return lanczos2(offsets - frac[..., None])
