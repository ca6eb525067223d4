"""Residual-jitter evaluation metric.

Reference: eval_jitter.cpp:46-71 — per consecutive-frame pair, dense
Farneback optical flow, the median flow magnitude over pixels; the final
``median_jitter_px`` is the median of those per-frame medians. The grid
searches score combos by the ratio out_jitter / in_jitter
(grid_search_align.cpp:183-184).

Uses cv2's Farneback (identical algorithm + parameters to the reference)
when available, with a JAX pyramidal Lucas-Kanade dense-flow fallback so the
metric also runs in cv2-free environments (and on device).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2  # type: ignore

    HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    HAS_CV2 = False

# Farneback parameters as in eval_jitter.cpp:50-51.
_FARNEBACK_ARGS = dict(pyr_scale=0.5, levels=3, winsize=15, iterations=3,
                       poly_n=5, poly_sigma=1.2, flags=0)


def _flow_median_cv2(prev_gray, gray):
    flow = cv2.calcOpticalFlowFarneback(prev_gray, gray, None,
                                        **_FARNEBACK_ARGS)
    mag = np.hypot(flow[..., 0], flow[..., 1])
    return float(np.median(mag))


def _flow_median_jax(prev_gray, gray):  # pragma: no cover - fallback path
    """Coarse dense-LK fallback: per-block translation via phase of local
    gradients; adequate for a relative jitter metric."""
    import jax.numpy as jnp

    from video_stabilizer_tpu.ops.phase_corr import phase_correlate

    a = jnp.asarray(prev_gray, jnp.float32)
    b = jnp.asarray(gray, jnp.float32)
    h, w = a.shape
    bs = 64
    mags = []
    for y in range(0, h - bs + 1, bs):
        for x in range(0, w - bs + 1, bs):
            shift, _ = phase_correlate(a[y : y + bs, x : x + bs],
                                       b[y : y + bs, x : x + bs])
            s = np.asarray(shift)
            mags.append(float(np.hypot(s[0], s[1])))
    return float(np.median(np.asarray(mags))) if mags else 0.0


def median_jitter_px(frames) -> float:
    """``median_jitter_px`` over an iterable of frames (BGR u8 or gray u8).

    Exactly the reference metric: median over frames of the per-frame median
    Farneback-flow magnitude (eval_jitter.cpp:59-71).
    """
    per_frame = []
    prev = None
    for frame in frames:
        frame = np.asarray(frame)
        if frame.ndim == 3:
            if HAS_CV2:
                gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            else:  # pragma: no cover
                f = frame.astype(np.float64)
                gray = np.clip(np.round(
                    0.114 * f[..., 0] + 0.587 * f[..., 1] + 0.299 * f[..., 2]),
                    0, 255).astype(np.uint8)
        else:
            gray = frame
        if prev is not None:
            if HAS_CV2:
                per_frame.append(_flow_median_cv2(prev, gray))
            else:  # pragma: no cover
                per_frame.append(_flow_median_jax(prev, gray))
        prev = gray
    if not per_frame:
        return 0.0
    return float(np.median(np.asarray(per_frame)))


def jitter_ratio(input_frames, output_frames) -> float:
    """out/in jitter ratio — the grid searches' objective
    (grid_search_align.cpp:183-184). Lower is better."""
    in_j = median_jitter_px(input_frames)
    out_j = median_jitter_px(output_frames)
    return out_j / max(in_j, 1e-12)
