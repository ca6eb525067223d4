"""Phase-correlation translation estimator (XLA FFT).

The reference uses cv::phaseCorrelate on pyramid level 2 as an optional
initial TX/TY guess for fast pans (alignment.cpp:369-388, default off —
alignment.hpp:11-12). This is the TPU-native equivalent: rfft2 cross-power
spectrum, peak + 5x5 weighted-centroid subpixel refinement, all on device.

Sign convention: ``phase_correlate(src1, src2)`` returns the (dx, dy) that
ALIGNS src2 back onto src1 — i.e. the NEGATIVE of the content displacement
src1 -> src2. This matches the convention the reference's init formula
assumes (transform.TX = detected * scale with a flip only on keyframes,
alignment.cpp:380-386, which is only sign-correct under this convention);
modern cv2 (5.x) returns the opposite sign (verified in
tests/test_phase_corr.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def phase_correlate(src1, src2, eps=1e-15):
    """Estimate the translation between two same-shape f32 images.

    Returns:
      shift: (2,) float32 (dx, dy).
      response: scalar float32 peak-neighborhood correlation energy
        (comparable to cv2's response; used against
        phase_correlate_threshold, alignment.cpp:379).
    """
    a = src1.astype(jnp.float32)
    b = src2.astype(jnp.float32)
    h, w = a.shape[-2], a.shape[-1]

    fa = jnp.fft.rfft2(a)
    fb = jnp.fft.rfft2(b)
    cross = fa * jnp.conj(fb)
    cross = cross / (jnp.abs(cross) + eps)
    corr = jnp.fft.irfft2(cross, s=(h, w))  # (H, W) real

    peak_flat = jnp.argmax(corr)
    py = peak_flat // w
    px = peak_flat % w

    # 5x5 weighted centroid around the peak, wrap-around indexing.
    offs = jnp.arange(-2, 3)
    ys = (py + offs) % h
    xs = (px + offs) % w
    win = corr[ys[:, None], xs[None, :]]
    win = jnp.maximum(win, 0.0)
    wsum = jnp.sum(win)
    dy = jnp.sum(win * offs[:, None]) / (wsum + eps)
    dx = jnp.sum(win * offs[None, :]) / (wsum + eps)

    fx = px.astype(jnp.float32) + dx
    fy = py.astype(jnp.float32) + dy
    # Wrap to signed shifts.
    fx = jnp.where(fx > w / 2, fx - w, fx)
    fy = jnp.where(fy > h / 2, fy - h, fy)

    # corr peak of phaseCorrelate(a, b) sits at the position of b's content
    # relative to a's, with OpenCV's sign convention src2 = shift(src1, +d):
    # a pure roll of +d pixels puts the peak at +d.
    response = wsum
    return jnp.stack([fx, fy]), response
