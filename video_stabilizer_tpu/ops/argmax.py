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


def _argmax_coords(tiles_abs, tile_size, ht, wt):
    """Flat within-tile argmax -> absolute (x, y) coords. Returns (idx, coords)."""
    idx = jnp.argmax(tiles_abs, axis=-1)  # (..., Ht, Wt) int
    dy = idx // tile_size
    dx = idx % tile_size
    ty = jnp.arange(ht, dtype=jnp.int32)[:, None]
    tx = jnp.arange(wt, dtype=jnp.int32)[None, :]
    coord_x = (tx * tile_size + dx).astype(jnp.int32)
    coord_y = (ty * tile_size + dy).astype(jnp.int32)
    return idx, jnp.stack([coord_x, coord_y], axis=-1)  # (..., Ht, Wt, 2)


def grad_argmax(grad_x, grad_y, tile_size):
    """Per-tile argmax of |grad|, separately for X and Y gradients.

    Reference: generators.cpp:273-293 — emits absolute pixel coords per tile.

    Args:
      grad_x, grad_y: (..., H, W) float gradient images.
      tile_size: static int (see config.tile_size_for for the adaptive rule).

    Returns:
      (idx_x, coords_x, idx_y, coords_y) where idx_* is the flat within-tile
      argmax (..., Ht, Wt) — reusable with ``take_at_tile_argmax`` to read any
      image at the argmax locations without a gather — and coords_* is
      (..., Ht, Wt, 2) absolute (x, y) int32.
    """
    h, w = grad_x.shape[-2], grad_x.shape[-1]
    ht, wt = h // tile_size, w // tile_size
    tiles_x = jnp.abs(tile_view(grad_x, tile_size))
    tiles_y = jnp.abs(tile_view(grad_y, tile_size))
    idx_x, coords_x = _argmax_coords(tiles_x, tile_size, ht, wt)
    idx_y, coords_y = _argmax_coords(tiles_y, tile_size, ht, wt)
    return idx_x, coords_x, idx_y, coords_y


def take_at_tile_argmax(img, idx, tile_size):
    """Read ``img`` at each tile's argmax location using the within-tile index.

    Because the argmax coordinate is inside its own tile by construction, the
    read is a ``take_along_axis`` on the tile view — a regular, dense op with
    no image-level gather. This replaces the reference's random-access reads
    of the gradient images (generators.cpp:346-385) and of the template image
    (generators.cpp:554-556, 666-668).

    Args:
      img: (..., H, W) array.
      idx: (..., Ht, Wt) flat within-tile argmax from ``grad_argmax``.
    Returns:
      (..., Ht, Wt) values of ``img`` at the argmax pixels.
    """
    tiles = tile_view(img, tile_size)
    return jnp.take_along_axis(tiles, idx[..., None], axis=-1)[..., 0]
