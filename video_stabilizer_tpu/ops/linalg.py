"""Tiny on-device linear algebra for the Gauss-Newton solve.

``jnp.linalg.eigh`` on a 4x4 costs ~1.1 ms/call on TPU (generic LAPACK-style
lowering — measured, see bench notes in the git history); the GN loop needs
a symmetric 4x4 eigendecomposition per pyramid level per frame. This module
provides a branch-free cyclic-Jacobi eigensolver specialized to tiny
symmetric matrices: a fixed number of unrolled rotation sweeps, ~10k flops,
pure VPU arithmetic, vmappable.

Used to replicate the reference's condition check + Tikhonov + DECOMP_SVD
pseudo-inverse (alignment.cpp:553-583) entirely on device.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _round_robin_rounds(n: int):
    """All n*(n-1)/2 index pairs as n-1 rounds of n/2 DISJOINT pairs
    (the circle round-robin schedule). Disjoint Jacobi rotations commute
    exactly, so each round applies as ONE orthogonal matrix."""
    idx = list(range(n))
    rounds = []
    for _ in range(n - 1):
        pairs = [tuple(sorted((idx[i], idx[n - 1 - i])))
                 for i in range(n // 2)]
        rounds.append(tuple(pairs))
        idx = [idx[0], idx[-1]] + idx[1:-1]
    return tuple(rounds)


def eigh_sym(A, sweeps: int = 6):
    """Eigendecomposition of a small static-size symmetric matrix via
    fixed-sweep Jacobi rotations.

    Two orderings, same n*(n-1)/2 pairs per sweep:

    * n == 4 (the similarity-transform Hessian): classic CYCLIC ordering,
      sequential row/column rewrites. 36 unrolled rotations — small, and
      its numerics are pinned bit-for-bit by the golden measurement trace
      (tests/test_golden_trace.py), so this path must not change.
    * n >= 6 (the 8x8 homography Hessian): PARALLEL round-robin ordering.
      Each round rotates n/2 DISJOINT pairs at once; disjoint Givens
      rotations commute exactly, so the round is ONE dense orthogonal
      update A <- R A R^T, V <- V R^T (three n x n matmuls) instead of
      n/2 sequential row/column rewrites. The cyclic form unrolled to
      ~1000 dynamic-update-slice + 336 trig ops per 8x8 call — 16.6% of
      the whole 4K chunk program as profiled (apps/profile_chunk.py
      --mode 4k); this form is ~12 ops per round with the constant
      one-hot selectors folded by XLA. Rotation ORDER differs from
      cyclic, so eigenvectors/values differ at roundoff level — fine for
      the homography path, whose tests tolerance this, but exactly why
      n == 4 keeps the cyclic path.

    Args:
      A: (n, n) symmetric (float32/float64), n static, small and EVEN
        (4 similarity, 8 homography).
      sweeps: fixed sweep count (6 sweeps reaches f32 machine precision
        for tiny matrices; convergence is quadratic).

    Returns:
      (w, V): eigenvalues (n,) (unsorted) and eigenvectors (n, n) with
      A ≈ V @ diag(w) @ V.T.
    """
    n = A.shape[-1]
    assert n % 2 == 0, "eigh_sym supports even sizes (4, 8)"
    if n == 4:
        return _eigh_sym_cyclic(A, sweeps)
    dtype = A.dtype
    V = jnp.eye(n, dtype=dtype)
    eps = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

    # Constant per-round selectors (folded by XLA): Ep/Eq pick the pair
    # rows; rest = identity on the untouched diagonal entries.
    sel = []
    for pairs in _round_robin_rounds(n):
        ps = [p for p, _ in pairs]
        qs = [q for _, q in pairs]
        ep = np.eye(n, dtype=np.float64)[ps]
        eq = np.eye(n, dtype=np.float64)[qs]
        rest = np.eye(n, dtype=np.float64) - ep.T @ ep - eq.T @ eq
        sel.append((jnp.asarray(ep, dtype), jnp.asarray(eq, dtype),
                    jnp.asarray(rest, dtype)))

    for _ in range(sweeps):
        for ep, eq, rest in sel:
            rows_p = ep @ A                       # (n/2, n)
            rows_q = eq @ A
            app = jnp.sum(rows_p * ep, axis=1)    # (n/2,)
            aqq = jnp.sum(rows_q * eq, axis=1)
            apq = jnp.sum(rows_p * eq, axis=1)
            # Branch-free rotations: phi = 0.5*atan2(2*apq, app - aqq)
            # zeroes each A[p,q]; apq == 0 gives c=1, s=0 up to roundoff.
            phi = 0.5 * jnp.arctan2(2.0 * apq, app - aqq + eps)
            c = jnp.cos(phi)[:, None]
            s = jnp.sin(phi)[:, None]
            r = rest + ep.T @ (c * ep + s * eq) + eq.T @ (c * eq - s * ep)
            A = r @ A @ r.T
            V = V @ r.T

    return jnp.diagonal(A), V


def _rot_rows(M, p, q, c, s):
    """Givens ROW rotation without dynamic-update-slice: rebuild the n rows
    as one stack (rows p/q get the exact two-term updates, the rest copy
    through). Arithmetic is expression-identical to the `.at[p].set(...)`
    form it replaces — only the in-place writes go; the 4x4 cyclic
    unroll's ~400 tiny DUS ops per call were ~7% of the 1080p chunk
    program (apps/profile_chunk.py --by-source, linalg.py rows)."""
    rows = []
    for i in range(M.shape[-2]):
        if i == p:
            rows.append(c * M[p, :] + s * M[q, :])
        elif i == q:
            rows.append(-s * M[p, :] + c * M[q, :])
        else:
            rows.append(M[i, :])
    return jnp.stack(rows)


def _rot_cols(M, p, q, c, s):
    """Givens COLUMN rotation, same DUS-free construction as _rot_rows."""
    cols = []
    for j in range(M.shape[-1]):
        if j == p:
            cols.append(c * M[:, p] + s * M[:, q])
        elif j == q:
            cols.append(-s * M[:, p] + c * M[:, q])
        else:
            cols.append(M[:, j])
    return jnp.stack(cols, axis=-1)


def _eigh_sym_cyclic(A, sweeps: int = 6):
    """Sequential cyclic-Jacobi reference ordering (golden-trace-exact).

    Kept for n == 4: the measurement golden trace pins the similarity GN
    trajectory through this exact rotation order. The per-rotation row and
    column updates are stacked rebuilds (bit-identical expressions), not
    dynamic-update-slices — see _rot_rows.
    """
    n = A.shape[-1]
    pairs = [(p, q) for p in range(n) for q in range(p + 1, n)]
    dtype = A.dtype
    V = jnp.eye(n, dtype=dtype)
    eps = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

    for _ in range(sweeps):
        for (p, q) in pairs:
            apq = A[p, q]
            app = A[p, p]
            aqq = A[q, q]
            # Branch-free rotation: phi = 0.5*atan2(2*apq, app - aqq) zeroes
            # A[p,q]; when apq == 0 this gives c=1, s=0 up to roundoff.
            phi = 0.5 * jnp.arctan2(2.0 * apq, app - aqq + eps)
            c = jnp.cos(phi)
            s = jnp.sin(phi)
            # Rows first, then columns of the row-updated matrix (the
            # standard two-sided application order).
            A = _rot_cols(_rot_rows(A, p, q, c, s), p, q, c, s)
            V = _rot_cols(V, p, q, c, s)

    return jnp.diagonal(A), V


def eigh_sym4(A, sweeps: int = 6):
    """4x4 specialization of eigh_sym (the GN Hessian case)."""
    return eigh_sym(A, sweeps=sweeps)


def regularized_pinv_sym4(H, cond_threshold: float = 1e6,
                          tikhonov_scale: float = 1e-6):
    """Condition-checked, Tikhonov-regularized pseudo-inverse of a small
    symmetric PSD matrix (alignment.cpp:553-583 semantics):

      cond = w_max / (w_min + 1e-10); if cond > 1e6, add 1e-6 * w_max to the
      diagonal; invert with near-null eigenvalues zeroed (DECOMP_SVD).

    Works for any small static size (4x4 similarity, 8x8 homography).
    """
    w, V = eigh_sym(H)
    w_max = jnp.max(w)
    w_min = jnp.min(w)
    cond = w_max / (w_min + 1e-10)
    lam = jnp.where(cond > cond_threshold, tikhonov_scale * w_max,
                    jnp.zeros((), H.dtype))
    w2 = w + lam
    cutoff = jnp.maximum(w_max + lam, 0.0) * 1e-7
    inv_w = jnp.where(w2 > cutoff, 1.0 / w2, 0.0)
    return (V * inv_w[None, :]) @ V.T
