"""Gather-free sparse sampling via per-tile windows.

The only true random access in the whole pipeline is sampling the keyframe
at warped keypoint positions (5x5 Lanczos2 patches — generators.cpp:459-498).
XLA gathers on TPU run at ~30M elements/s (measured); at ~2000 points x 25
taps x ~10 GN iterations x 6 levels x 2 sets per frame they dominate
everything.

TPU-native restructuring: keypoints live one-per-tile on a regular grid, so
once per keyframe we extract a dense, overlapping WINDOW around every tile
— pure strided slicing of a padded image, no gathers, fully fused by XLA —
and every warped sample becomes a position-dependent weighted reduction
*within its own window*:

    val[n] = sum_{p,q} L(p - rel_y[n]) L(q - rel_x[n]) window[n, p, q]

The Lanczos2 kernel is zero beyond radius 2, so evaluating it densely over
the whole window computes exactly the reference's 5x5 weighted sample —
while turning the inner GN loop into batched small matvecs (VPU/MXU food)
with zero memory indirection.

Capture envelope: a window of margin m supports warp displacements up to
(m - 2) px at that level before the sample position clamps to the window
interior (the reference instead clamps each tap to the image border —
generators.cpp:490-492; both behaviors only differ for points the outlier
rejection discards anyway). margin defaults to 12, covering the reference's
max_displacement=10 per-level envelope (alignment.hpp:40).
"""

from __future__ import annotations

import jax.numpy as jnp

from video_stabilizer_tpu.ops.lanczos import lanczos2


def window_size(tile: int, margin: int) -> int:
    return tile + 2 * margin


def extract_tile_windows(img, tile: int, margin: int, out_dtype=jnp.bfloat16):
    """(H, W) u8 -> (Ht, Wt, P, P) windows, P = tile + 2*margin.

    Window (i, j) covers image rows [i*tile - margin, i*tile - margin + P)
    and the analogous columns, with repeat-edge padding. Built from
    2*ceil(P/tile) tile-aligned reshaped slices — no gathers, op count
    independent of P's fine structure (keeps XLA compile time sane).
    u8 values are exact in bfloat16 (integers <= 256), halving the HBM
    traffic of the GN inner loop.
    """
    wins = _window_stack(img, tile, margin, out_dtype)
    return wins.transpose(0, 2, 1, 3)              # (ht, wt, P, P)


def _window_stack(img, tile: int, margin: int, out_dtype):
    """Shared tile-aligned slicing: (Ht, P_y, Wt, P_x) without transposes."""
    h, w = img.shape[-2], img.shape[-1]
    t = tile
    ht, wt = h // t, w // t
    p = window_size(t, margin)
    k = -(-p // t)
    padded = jnp.pad(img, ((margin, margin + t), (margin, margin + t)),
                     mode="edge").astype(out_dtype)
    rows = jnp.stack(
        [padded[kk * t : kk * t + ht * t, :].reshape(ht, t, -1)
         for kk in range(k)], axis=1)              # (ht, K, t, W')
    rows = rows.reshape(ht, k * t, -1)[:, :p, :]   # (ht, P, W')
    cols = jnp.stack(
        [rows[:, :, kk * t : kk * t + wt * t].reshape(ht, p, wt, t)
         for kk in range(k)], axis=3)              # (ht, P, wt, K, t)
    return cols.reshape(ht, p, wt, k * t)[:, :, :, :p]  # (ht, P, wt, P)


def extract_tile_windows_flat(img, tile: int, margin: int,
                              out_dtype=jnp.uint8):
    """Like ``extract_tile_windows`` but laid out (P, P, Ht*Wt): the tile
    grid lives on the minor (lane) axis, so the GN inner loop's weight
    arrays and reductions tile the VPU's (8, 128) registers densely instead
    of wasting ~16x on a (sets, taps) minor layout (measured via the op
    profile — this is the hot loop's data layout).

    Construction: the lane-axis window gather (overlapping stride-``tile``
    column selections) is a ONE-HOT banded matmul on the MXU — the
    stack/reshape/transpose chain it replaces was the pipeline's largest
    data-movement cluster (~24% of the chunk program, profiled) because its
    final transpose moved the minor axis. Here every transpose keeps the
    minor axis in place. u8 pixels are exact in bf16 and the one-hot
    contraction copies them exactly, so the result is bit-identical to the
    slicing construction (pinned by the sampling oracle tests).

    Storage defaults to uint8: the pixel values are exact u8 integers, and
    u8 storage halves the GN inner loop's HBM traffic vs bf16 (the loop
    re-reads the windows every iteration; ``sample_windows_flat`` upcasts
    in-register, so the bf16 products are bit-identical either way). Pass
    bfloat16 for consumers that need the windows pre-cast (the Pallas GN
    kernel's VMEM operand).
    """
    h, w = img.shape[-2], img.shape[-1]
    t = tile
    ht, wt = h // t, w // t
    p = window_size(t, margin)
    k = -(-p // t)
    padded = jnp.pad(img, ((margin, margin + t), (margin, margin + t)),
                     mode="edge")
    hp, wp = padded.shape
    # Sublane side: X[c + s*t, i, :] = padded[(i + s)*t + c, :].
    rows = jnp.concatenate(
        [padded[s * t : s * t + ht * t, :].reshape(ht, t, wp)
         for s in range(k)], axis=1)                  # (ht, k*t, Wp)
    x_mat = rows.transpose(1, 0, 2)[:p]               # (P, ht, Wp)
    # Lane side: S[x, q*wt + j] = 1 iff x == j*t + q (window col q of
    # tile j lives at padded col j*t + q).
    xs = jnp.arange(wp, dtype=jnp.int32)[:, None]
    m = jnp.arange(p * wt, dtype=jnp.int32)[None, :]
    q = m // wt
    j = m % wt
    s_mat = (xs == j * t + q).astype(jnp.bfloat16)
    wins = jnp.einsum("aix,xm->aim", x_mat.astype(jnp.bfloat16), s_mat,
                      preferred_element_type=jnp.float32)
    wins = wins.reshape(p, ht, p, wt).transpose(0, 2, 1, 3)
    return wins.reshape(p, p, ht * wt).astype(out_dtype)


def window_origins_flat(ht: int, wt: int, tile: int, margin: int):
    """Flat (Ht*Wt,) window-origin coordinates matching the flat layout."""
    ox, oy = window_origins(ht, wt, tile, margin)
    return ox.reshape(-1), oy.reshape(-1)


def sample_windows_flat(windows, rel_x, rel_y, dtype=jnp.float32):
    """Weight-normalized Lanczos2 sample, flat layout.

    Args:
      windows: (P, P, N) from ``extract_tile_windows_flat``.
      rel_x, rel_y: (..., N) positions in window coords, pre-clamped.
    Returns:
      (..., N) ``dtype`` samples.
    """
    p = windows.shape[0]
    taps = jnp.arange(p, dtype=dtype)[:, None]                 # (P, 1)
    wy = lanczos2(taps - rel_y[..., None, :].astype(dtype))    # (..., P, N)
    wx = lanczos2(taps - rel_x[..., None, :].astype(dtype))
    # Explicit broadcast-multiply-reduce instead of einsum: dot_general
    # lowers this contraction as an N-batched (P)x(P,P) bilinear form whose
    # operand layouts put the tap axes minor — ~16x register-tile waste
    # (measured). The reduce-fusion keeps N on the lane axis throughout.
    # The product runs in bf16 with an f32 reduce accumulator: upcasting the
    # windows first makes XLA materialize an f32 copy of the whole tensor in
    # HBM (measured ~0.3ms/iteration at 1080p); bf16 products lose <1
    # intensity RMS per sample, ~0.001px of GN accuracy after the N-point
    # average. u8-stored windows upcast in-register to the same bf16 values
    # — bit-identical products at half the HBM traffic. (A separable
    # two-stage reduction — x-taps then y-taps — measured 25% faster in an
    # isolated GN-loop micro-bench but 5-7% SLOWER in the full chunk
    # program: it splits the sampling/ICA reduce fusion and materializes the
    # (..., P, N) inner intermediate per iteration. Keep the fused form.)
    wdt = jnp.bfloat16 if windows.dtype == jnp.uint8 else windows.dtype
    prod = (windows.astype(wdt) * wy[..., :, None, :].astype(wdt)
            * wx[..., None, :, :].astype(wdt))
    num = jnp.sum(prod, axis=(-3, -2), dtype=dtype)
    den = jnp.sum(wy, axis=-2) * jnp.sum(wx, axis=-2)
    return num / den


def warp_rel_positions_flat(fx, fy, t_ul, ox, oy, p: int):
    """Flat-layout warped window positions.

    Args:
      fx, fy: (..., N) float keypoint coordinates.
      ox, oy: (N,) flat window origins.
    Returns:
      (rel_x, rel_y): (..., N) float32, clamped to the valid interior.
    """
    a, b, tx, ty = t_ul[0], t_ul[1], t_ul[2], t_ul[3]
    wx = (1.0 + a) * fx - b * fy + tx
    wy = b * fx + (1.0 + a) * fy + ty
    return clamp_rel(wx - ox, p), clamp_rel(wy - oy, p)


def window_origins(ht: int, wt: int, tile: int, margin: int):
    """Image-coordinate (x, y) of each window's [0, 0] corner, as (Ht, Wt)
    grids (broadcastable under leading batch/set axes)."""
    oy = jnp.arange(ht, dtype=jnp.float32) * tile - margin
    ox = jnp.arange(wt, dtype=jnp.float32) * tile - margin
    return (jnp.broadcast_to(ox[None, :], (ht, wt)),
            jnp.broadcast_to(oy[:, None], (ht, wt)))


def sample_windows(windows, rel_x, rel_y, dtype=jnp.float32):
    """Weight-normalized Lanczos2 sample at continuous window positions.

    Args:
      windows: (..., Ht, Wt, P, P) (bf16 ok — upcast in compute); leading
        axes broadcast against the positions'.
      rel_x, rel_y: (..., Ht, Wt) continuous positions in window coords,
        assumed pre-clamped to [2, P-3] (see ``clamp_rel``).
    Returns:
      (..., Ht, Wt) ``dtype`` sample values.
    """
    p = windows.shape[-1]
    taps = jnp.arange(p, dtype=dtype)
    # Only the <=5 taps within radius 2 of the position are nonzero.
    wy = lanczos2(taps - rel_y[..., None].astype(dtype))
    wx = lanczos2(taps - rel_x[..., None].astype(dtype))
    w = windows.astype(dtype)
    num = jnp.einsum("...pq,...p,...q->...", w, wy, wx)
    den = jnp.sum(wy, axis=-1) * jnp.sum(wx, axis=-1)
    return num / den


def clamp_rel(rel, p: int):
    """Clamp a window-relative position so all 5 Lanczos taps stay inside.

    floor(rel) + [-2, 2] within [0, p-1] requires rel in [2, p-3); clamp a
    hair inside so floor() stays in range.
    """
    return jnp.clip(rel, 2.0, p - 3.0 - 1e-3)


def warp_rel_positions(coords, t_ul, ox, oy, p: int):
    """Warped sample positions of integer keypoint ``coords``, expressed in
    their window's coordinates and clamped to the valid interior.

    Args:
      coords: (..., Ht, Wt, 2) int (x, y) absolute keypoint coords.
      t_ul: (4,) origin-based transform (W*0.5 center convention upstream).
      ox, oy: (Ht, Wt) window-origin grids from ``window_origins``.
    Returns:
      (rel_x, rel_y): (..., Ht, Wt) float32 positions.
    """
    fx = coords[..., 0].astype(jnp.float32)
    fy = coords[..., 1].astype(jnp.float32)
    a, b, tx, ty = t_ul[0], t_ul[1], t_ul[2], t_ul[3]
    wx = (1.0 + a) * fx - b * fy + tx
    wy = b * fx + (1.0 + a) * fy + ty
    rel_x = clamp_rel(wx - ox, p)
    rel_y = clamp_rel(wy - oy, p)
    return rel_x, rel_y
