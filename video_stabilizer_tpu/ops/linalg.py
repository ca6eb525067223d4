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

import jax.numpy as jnp

def eigh_sym(A, sweeps: int = 6):
    """Eigendecomposition of a small static-size symmetric matrix via
    cyclic Jacobi rotations.

    Args:
      A: (n, n) symmetric (float32/float64), n static and small (4, 8, ...).
      sweeps: fixed sweep count (6 sweeps reaches f32 machine precision for
        tiny matrices; convergence is quadratic).

    Returns:
      (w, V): eigenvalues (n,) (unsorted) and eigenvectors (n, n) with
      A ≈ V @ diag(w) @ V.T.
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
            # Apply G^T A G and V G with G = I except G[pp]=G[qq]=c,
            # G[pq]=-s? (sign folded below). Row/col updates, branch-free.
            row_p = A[p, :]
            row_q = A[q, :]
            new_p = c * row_p + s * row_q
            new_q = -s * row_p + c * row_q
            A = A.at[p, :].set(new_p).at[q, :].set(new_q)
            col_p = A[:, p]
            col_q = A[:, q]
            new_cp = c * col_p + s * col_q
            new_cq = -s * col_p + c * col_q
            A = A.at[:, p].set(new_cp).at[:, q].set(new_cq)
            v_p = V[:, p]
            v_q = V[:, q]
            V = V.at[:, p].set(c * v_p + s * v_q)
            V = V.at[:, q].set(-s * v_p + c * v_q)

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
