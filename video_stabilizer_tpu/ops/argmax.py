"""Per-tile gradient-argmax keypoint selection.

Reference: the ``grad_argmax`` Halide generator (generators.cpp:260-326) —
for every ``tile_size x tile_size`` tile, independently for the X and Y
gradient images, the absolute pixel coordinates of the max-|grad| pixel.
The reference AOT-compiles 10 variants for tile_size = 2..20 (CMakeLists
212-253); here tile_size is a static Python int, so each (resolution, level)
specializes at trace time for free.

TPU-native formulation: reshape the (H, W) image into a (Ht, Wt, t*t) tile
view and take ``argmax`` over the last axis — a dense, layout-friendly
reduction with no gathers. Tie-breaking matches Halide: the flattened tile
axis iterates dy (rows) slowest / dx fastest, the same order as the
reference's RDom (r.y outer, r.x inner), and both keep the first maximum.
"""

from __future__ import annotations

import jax.numpy as jnp


def tile_view(img, tile_size):
    """(..., H, W) -> (..., Ht, Wt, t*t) tile view, cropping remainders.

    The reference's output grid is floor(W/t) x floor(H/t) (imgproc.cpp:164-165),
    i.e. the bottom/right remainder pixels are never inspected.
    """
    t = tile_size
    h, w = img.shape[-2], img.shape[-1]
    ht, wt = h // t, w // t
    x = img[..., : ht * t, : wt * t]
    x = x.reshape(x.shape[:-2] + (ht, t, wt, t))
    x = jnp.swapaxes(x, -3, -2)  # (..., Ht, Wt, t, t)
    return x.reshape(x.shape[:-2] + (t * t,))


def _mask_reduce(values, idx, axis):
    """values summed where a broadcast iota along ``axis`` equals ``idx``
    (idx broadcast with a singleton at ``axis``). Branchless select-reduce —
    the TPU-fast replacement for take_along_axis, which XLA lowers as a
    gather (~0.5 ms per call at 1080p, measured)."""
    n = values.shape[axis]
    shape = [1] * values.ndim
    shape[axis] = n
    iota = jnp.arange(n, dtype=jnp.int32).reshape(shape)
    sel = (iota == jnp.expand_dims(idx, axis)).astype(values.dtype)
    return jnp.sum(values * sel, axis=axis)


def _tile_argmax_2stage(a, tile_size):
    """Per-tile argmax via two axis-aligned reductions. Every reshape is a
    free split of a contiguous dimension — no transposes — and all index
    plumbing is mask-reduce, so nothing lowers as a gather.

    Tie-breaking matches the reference's RDom scan order (r.y outer, r.x
    inner, first max wins): stage 1 takes the first max along x within each
    row segment, stage 2 the first maximal row.

    Args:
      a: (..., H', W') values (already cropped to tile multiples); leading
        axes batch (the X/Y gradient sets ride one fused reduction).
    Returns:
      (dy, dx): (..., Ht, Wt) int32 within-tile offsets of the per-tile
      argmax of ``a``.
    """
    t = tile_size
    lead = a.shape[:-2]
    hc, wc = a.shape[-2], a.shape[-1]
    ht, wt = hc // t, wc // t
    # Stage 1 (x within tile): (..., H', Wt, t) — minor split, free.
    a1 = a.reshape(lead + (hc, wt, t))
    dx1 = jnp.argmax(a1, axis=-1).astype(jnp.int32)            # (..., H', Wt)
    v1 = _mask_reduce(a1, dx1, axis=-1)                        # (..., H', Wt)
    # Stage 2 (y within tile): (..., Ht, t, Wt) — major split, free.
    dy = jnp.argmax(v1.reshape(lead + (ht, t, wt)),
                    axis=-2).astype(jnp.int32)
    dx = _mask_reduce(dx1.reshape(lead + (ht, t, wt)).astype(jnp.float32),
                      dy, axis=-2).astype(jnp.int32)           # (..., Ht, Wt)
    return dy, dx


def _value_at(img, dy, dx, tile_size):
    """img value at per-tile offsets (dy, dx) — two mask-reduces on free
    reshapes. Leading axes of ``img`` and ``dy``/``dx`` broadcast (one
    image read at both keypoint sets' offsets, or a stack of images each
    at its own offsets)."""
    t = tile_size
    h, w = img.shape[-2], img.shape[-1]
    ht, wt = h // t, w // t
    x = img[..., : ht * t, : wt * t].astype(jnp.float32)
    # Row select: (..., Ht, t, W') with dy broadcast over each tile's cols.
    rows = _mask_reduce(x.reshape(x.shape[:-2] + (ht, t, wt * t)),
                        jnp.repeat(dy, t, axis=-1), axis=-2)   # (..., Ht, W')
    # Column select: (..., Ht, Wt, t) minor split.
    return _mask_reduce(rows.reshape(rows.shape[:-1] + (wt, t)),
                        dx, axis=-1)                           # (..., Ht, Wt)


def grad_argmax(grad_x, grad_y, tile_size):
    """Per-tile argmax of |grad|, separately for X and Y gradients.

    Reference: generators.cpp:273-293 — emits absolute pixel coords per tile.

    Args:
      grad_x, grad_y: (H, W) float gradient images.
      tile_size: static int (see config.tile_size_for for the adaptive rule).

    Returns:
      (idx_x, coords_x, idx_y, coords_y) where idx_* is the flat within-tile
      argmax (Ht, Wt) — reusable with ``take_at_tile_argmax`` to read any
      image at the argmax locations without a gather — and coords_* is
      (Ht, Wt, 2) absolute (x, y) int32.
    """
    t = tile_size
    h, w = grad_x.shape[-2], grad_x.shape[-1]
    ht, wt = h // t, w // t
    ty = jnp.arange(ht, dtype=jnp.int32)[:, None]
    tx = jnp.arange(wt, dtype=jnp.int32)[None, :]

    # Both gradient sets through ONE stacked reduction pass (identical
    # per-slice arithmetic; halves the keyframe argmax dispatch count).
    g2 = jnp.abs(jnp.stack([grad_x, grad_y])[:, : ht * t, : wt * t])
    dy, dx = _tile_argmax_2stage(g2, t)                 # (2, Ht, Wt)
    idx = dy * t + dx
    coords = jnp.stack([tx * t + dx, ty * t + dy], axis=-1)  # (2, Ht, Wt, 2)
    return idx[0], coords[0], idx[1], coords[1]


def take_at_tile_argmax(img, idx, tile_size):
    """Read ``img`` at each tile's argmax location using the within-tile index.

    Because the argmax coordinate is inside its own tile by construction,
    the read is two mask-reduces on free reshapes — dense, transpose-free,
    gather-free. This replaces the reference's random-access reads of the
    gradient images (generators.cpp:346-385) and of the template image
    (generators.cpp:554-556, 666-668).

    Args:
      img: (..., H, W) array; leading axes broadcast against ``idx``'s.
      idx: (..., Ht, Wt) flat within-tile argmax from ``grad_argmax`` —
        stack both keypoint sets' indices to read them in one fused pass.
    Returns:
      (..., Ht, Wt) float32 values of ``img`` at the argmax pixels.
    """
    t = tile_size
    return _value_at(img, idx // t, idx % t, t)
