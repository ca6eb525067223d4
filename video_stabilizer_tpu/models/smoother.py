"""L1 / total-variation trajectory smoother.

Reference: smoother.cpp:18-127. Solves, per transform parameter,

    minimize  sum_i |x_i - d_i| + lambda * sum_i |x_{i+1} - x_i|

with 100 fixed iterations of (a) relaxation toward the data (alpha = 0.5)
and (b) a sequential Gauss-Seidel sweep of pairwise difference shrinkage
(diff > lambda: shrink by lambda split equally; else clamp the pair to its
midpoint). The sweep updates in place left-to-right, so it is inherently
sequential over the window — but the window is tiny (<= lagBehind + lagAhead
+ 1 = 16 at the defaults) and all four parameters (and any number of batched
streams / hyperparameter combos) smooth in parallel as the leading axes of a
``lax.fori_loop``.

The reference's ``m_measurements`` grows without bound (smoother.cpp:79);
here the window is a fixed ring buffer (SURVEY.md §5 recommends exactly
this).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def tvl1_smooth(data, lam, iterations: int = 100, valid_len=None):
    """TV-L1 smooth along the last axis (batched over leading axes).

    Args:
      data: (..., N) measurements.
      lam: smoothing strength (traced scalar OK).
      iterations: fixed iteration count (static; reference uses 100).
      valid_len: optional () int — only the first ``valid_len`` entries are
        real; trailing entries are ignored (their pair-updates are masked).
        Needed because the reference's window is shorter near t=0
        (smoother.cpp:91-92) but XLA shapes are static.

    Returns:
      (..., N) smoothed values.
    """
    data = jnp.asarray(data)
    n = data.shape[-1]
    lam = jnp.asarray(lam, data.dtype)
    if valid_len is None:
        valid_len = n
    valid_len = jnp.asarray(valid_len, jnp.int32)
    tiny = jnp.finfo(data.dtype).tiny

    # The Gauss-Seidel sweep is inherently sequential over the window, but
    # the window is tiny (<= 16) and static. Represent the window as a TUPLE
    # of n column arrays: every pair update becomes pure dataflow between
    # two Python variables — no dynamic-update-slice, no .at[].set scatter;
    # XLA fuses each 100-iteration body into a handful of kernels.
    data_cols = tuple(data[..., i] for i in range(n))
    active = tuple((i + 1) < valid_len for i in range(n - 1))

    def iteration(cols, _):
        # (a) relax toward data, alpha = 0.5 (smoother.cpp:29-38)
        cols = [0.5 * c + 0.5 * d for c, d in zip(cols, data_cols)]
        # (b) sequential pairwise TV shrinkage (smoother.cpp:41-60)
        for i in range(n - 1):
            xi, xj = cols[i], cols[i + 1]
            diff = xj - xi
            mag = jnp.abs(diff)
            shrink = (mag - lam) / jnp.maximum(mag, tiny) * 0.5
            mid = 0.5 * (xi + xj)
            take = mag > lam
            new_i = jnp.where(take, xi + diff * shrink, mid)
            new_j = jnp.where(take, xj - diff * shrink, mid)
            # Pairs beyond the valid prefix are inert.
            cols[i] = jnp.where(active[i], new_i, xi)
            cols[i + 1] = jnp.where(active[i], new_j, xj)
        return tuple(cols), None

    out_cols, _ = jax.lax.scan(iteration, data_cols, None, length=iterations)
    return jnp.stack(out_cols, axis=-1)


def tvl1_smooth_np(data, lam, iterations: int = 100):
    """Pure-numpy f64 twin of ``tvl1_smooth`` (oracle for tests and host use)."""
    x = np.array(data, np.float64, copy=True)
    d = np.asarray(data, np.float64)
    n = x.shape[-1]
    for _ in range(iterations):
        x = 0.5 * x + 0.5 * d
        for i in range(n - 1):
            diff = x[..., i + 1] - x[..., i]
            mag = np.abs(diff)
            gt = mag > lam
            shrink = np.where(gt, (mag - lam) / np.maximum(mag, 1e-300) * 0.5, 0.0)
            mid = 0.5 * (x[..., i] + x[..., i + 1])
            x[..., i] = np.where(gt, x[..., i] + diff * shrink, mid)
            x[..., i + 1] = np.where(gt, x[..., i + 1] - diff * shrink, mid)
    return x


@functools.partial(jax.jit, static_argnames=("iterations",))
def _smooth_window(buf, lam, middle, count, iterations):
    """Smooth a (window, 4) buffer (first ``count`` rows valid) and return
    the ``middle`` row."""
    sm = tvl1_smooth(buf.T, lam, iterations=iterations, valid_len=count)  # (4, W)
    return jax.lax.dynamic_slice_in_dim(sm, middle, 1, axis=-1)[:, 0]


class L1SmootherCenter:
    """Streaming lagged smoother mirroring the reference class
    (smoother.cpp:66-127): finalizes measurement k once k + lagAhead
    measurements exist, smoothing the window [k - lagBehind, k + lagAhead]
    and emitting the window-middle element.

    State lives in a fixed ring buffer instead of the reference's unbounded
    vector. The smoothing itself runs jitted; with `jit_smooth=False`, it
    runs in f64 numpy on host (bit-matching the reference's double math) —
    useful as an oracle and for tiny streaming workloads.
    """

    def __init__(self, lag_behind: int, lag_ahead: int, lambda_: float = 1.0,
                 iterations: int = 100, jit_smooth: bool = True):
        self.lag_behind = lag_behind
        self.lag_ahead = lag_ahead
        self.lambda_ = lambda_
        self.iterations = iterations
        self.jit_smooth = jit_smooth
        self.window = lag_behind + lag_ahead + 1
        self._buf = np.zeros((self.window, 4), np.float64)  # ring
        self._total = 0           # measurements received
        self._next_to_finalize = 0

    def update(self, meas):
        """Push one (4,) measurement. Returns (finalized (4,) np.ndarray or
        None) — None until the window ahead is full (smoother.cpp:84-86)."""
        self._buf[self._total % self.window] = np.asarray(meas, np.float64)
        self._total += 1
        newest = self._total - 1
        k = self._next_to_finalize
        if k + self.lag_ahead > newest:
            return None
        start = max(0, k - self.lag_behind)
        end = k + self.lag_ahead                      # inclusive
        idx = np.arange(start, end + 1)
        window_vals = self._buf[idx % self.window]    # (n, 4)
        middle = k - start
        if self.jit_smooth:
            buf = np.zeros((self.window, 4), np.float64)
            n = len(idx)
            buf[:n] = window_vals
            sm = _smooth_window(
                jnp.asarray(buf, jnp.float32), jnp.float32(self.lambda_),
                middle, n, self.iterations)
            out = np.asarray(sm, np.float64)
        else:
            sm = tvl1_smooth_np(window_vals.T, self.lambda_, self.iterations)
            out = sm[:, middle]
        self._next_to_finalize += 1
        return out
