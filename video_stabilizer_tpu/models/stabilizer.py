"""Streaming video stabilizer orchestrator.

Reference: VideoStabilizer::processFrame (stabilizer.cpp:9-117). Per frame:
buffer the input, measure inter-frame motion with the aligner, update the
lagged TV-L1 smoother, and — once more than ``lag`` measurements exist —
pop the earliest measurement, form the residual jitter
``meas ∘ smoothed⁻¹`` (stabilizer.cpp:58-64), fold it into the running
accumulator with displacement-based decay (stabilizer.cpp:69-87), and warp
the corresponding delayed frame by the accumulator's inverse
(stabilizer.cpp:96-99), optionally cropping (102-109).

TPU-native split of responsibilities:
  - device: BGR->gray conversion, the whole aligner program, the output
    color warp (the reference used host OpenCV for both conversions and the
    color warp — imgproc.cpp:446-484, alignment.cpp:212);
  - host: the tiny 4-vector deque bookkeeping and the decay/compose
    scalar algebra in f64 (exactly the reference's double math).

Known replicated quirk (SURVEY.md §3.1): at the defaults (lag=10,
smoother_memory=5), the smoothed transform paired with measurement[t] is
smoothed[t+5] — a constant 5-frame offset the reference code exhibits.
"""

from __future__ import annotations

import collections

import jax
import jax.numpy as jnp
import numpy as np

from video_stabilizer_tpu import transforms as T
from video_stabilizer_tpu.config import StabilizerParams
from video_stabilizer_tpu.models.aligner import VideoAligner
from video_stabilizer_tpu.models.smoother import L1SmootherCenter
from video_stabilizer_tpu.utils.metrics import time_function


# ------------------------- host-side f64 transform algebra -----------------
# The stabilizer's per-frame bookkeeping is ~10 scalar ops on 4-vectors; the
# reference does them in double on host. Mirror that exactly (device round
# trips for 4 floats would cost more than the math).

def _np_inverse(t):
    p = 1.0 + t[0]
    q = t[1]
    denom = p * p + q * q
    return np.array([p / denom - 1.0, -q / denom,
                     (-p * t[2] - q * t[3]) / denom,
                     (q * t[2] - p * t[3]) / denom])


def _np_compose(t1, t2):
    p1, q1 = 1.0 + t1[0], t1[1]
    p2, q2 = 1.0 + t2[0], t2[1]
    return np.array([p2 * p1 - q2 * q1 - 1.0,
                     p2 * q1 + q2 * p1,
                     p2 * t1[2] - q2 * t1[3] + t2[2],
                     q2 * t1[2] + p2 * t1[3] + t2[3]])


def _np_max_corner_displacement(t, width, height):
    cx, cy = width * 0.5, height * 0.5
    a, b, tx, ty = t
    corners = np.array([[0, 0], [width, 0], [0, height], [width, height]],
                       np.float64)
    px = corners[:, 0] - cx
    py = corners[:, 1] - cy
    wx = (1 + a) * px - b * py + cx + tx
    wy = b * px + (1 + a) * py + cy + ty
    d = np.hypot(wx - corners[:, 0], wy - corners[:, 1])
    return float(np.max(d))


def decay_factor(displacement, params: StabilizerParams):
    """Displacement-based decay of the accumulator (stabilizer.cpp:69-87)."""
    if displacement > params.max_disp:
        return params.max_decay
    if displacement > params.min_disp:
        f = (displacement - params.min_disp) / (params.max_disp - params.min_disp)
        f = min(max(f, 0.0), 1.0)
        return params.min_decay * (1.0 - f) + params.max_decay * f
    return params.min_decay


def bgr_to_gray(frame_bgr):
    """BGR u8 -> gray u8 matching OpenCV 5.x cvtColor BGR2GRAY (full-float
    0.114*B + 0.587*G + 0.299*R, rounded — NOT the legacy 14-bit fixed
    point, which differs by 1 LSB on ~0.2% of pixels).

    Channels are sliced from the u8 array BEFORE the float cast: casting
    the whole (..., 3) array first made XLA materialize a full f32 copy of
    the clip behind a layout change (~10.7 ms per 8x16-frame 1080p chunk,
    profiled copy_convert_fusion); slice-then-cast fuses into one pass and
    is bit-identical (measured zero diff over random u8 inputs)."""
    b = frame_bgr[..., 0].astype(jnp.float32)
    g = frame_bgr[..., 1].astype(jnp.float32)
    r = frame_bgr[..., 2].astype(jnp.float32)
    return jnp.round(0.114 * b + 0.587 * g + 0.299 * r).astype(jnp.uint8)


@jax.jit
def _to_gray(frame_bgr):
    return bgr_to_gray(frame_bgr)


class VideoStabilizer:
    """Streaming stabilizer with the reference's processFrame contract
    (stabilizer.hpp:32-39): feed frames one at a time; returns None until
    ``lag`` frames have accumulated, then one stabilized frame per call."""

    def __init__(self, params: StabilizerParams = StabilizerParams()):
        self.params = params
        self.aligner = VideoAligner(params.aligner)
        # lagBehind = lag, lagAhead = smoother_memory (stabilizer.cpp:3-4).
        self.smoother = L1SmootherCenter(
            params.lag, params.smoother_memory, params.lambda_)
        self._meas = collections.deque()
        self._frames = collections.deque()
        self._accum = np.zeros(4, np.float64)
        self.frame_index = 0
        self.align_failures = 0
        self._warp_fn = None

    def _warp(self, frame_dev, accum):
        """Warp the delayed frame by accum⁻¹ on device.

        warpBySimilarityTransform(frame, correction=accum⁻¹) nets out to
        sampling the source at accum(p) (see ops/warp.py direction note).
        """
        h, w = frame_dev.shape[0], frame_dev.shape[1]
        t = jnp.asarray(accum, jnp.float32)
        t_ul = T.center_to_ul(t, w, h, minus_one=True)
        if self._warp_fn is None:
            from video_stabilizer_tpu.models.batch import output_warp
            params = self.params
            self._warp_fn = jax.jit(
                lambda img, tt: output_warp(img, tt, params, w, h))
        return self._warp_fn(frame_dev, t_ul)

    def process_frame(self, frame_bgr):
        """Process one (H, W, 3) BGR u8 frame; returns the stabilized
        (cropped) frame as a device array, or None while filling the lag."""
        self.frame_index += 1
        frame_dev = jnp.asarray(frame_bgr)
        h, w = frame_dev.shape[0], frame_dev.shape[1]
        self._frames.append(frame_dev)

        # Instrumentation labels mirror the reference's TIME_FUNCTION
        # taxonomy (alignment.cpp:150-701); enable with VIDSTAB_METRICS=1.
        with time_function("ConvertToGray"):
            gray = _to_gray(frame_dev)
        with time_function("AlignNextFrame"):
            t_meas, ok = self.aligner.align_next_frame(gray)
        current_meas = np.asarray(t_meas, np.float64)
        success = bool(ok)
        if not success and self.frame_index > 1:
            # The first frame always reports success=False (no pair yet,
            # alignment.cpp:231-234) — warm-up, not a failure.
            self.align_failures += 1

        earliest_smoothed = None
        if self.params.enable_smoother:
            with time_function("SmootherUpdate"):
                earliest_smoothed = self.smoother.update(current_meas)

        # Alignment failure resets the accumulator (stabilizer.cpp:39-41).
        if not success:
            self._accum = np.zeros(4, np.float64)

        self._meas.append(current_meas)

        if len(self._meas) <= self.params.lag:
            return None

        earliest = self._meas.popleft()
        if self.params.enable_smoother and earliest_smoothed is not None:
            jitter = _np_compose(earliest, _np_inverse(earliest_smoothed))
        else:
            jitter = earliest

        new_accum = _np_compose(self._accum, jitter)
        disp = _np_max_corner_displacement(new_accum, w, h)
        new_accum = new_accum * decay_factor(disp, self.params)
        self._accum = new_accum

        if not self._frames:
            return None
        frame_to_stabilize = self._frames.popleft()
        with time_function("WarpBySimilarityTransform"):
            stabilized = self._warp(frame_to_stabilize, new_accum)

        c = self.params.crop_pixels
        if c > 0:
            stabilized = stabilized[c:-c, c:-c]
        return stabilized

    @property
    def accumulated_correction(self):
        return self._accum.copy()
