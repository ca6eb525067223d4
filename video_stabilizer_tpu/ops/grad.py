"""Central-difference image gradients.

Reference: the ``grad_xy`` Halide generator (generators.cpp:202-254):

    grad_x = 0.5 * (I(x+1, y) - I(x-1, y))
    grad_y = 0.5 * (I(x, y+1) - I(x, y-1))

with repeat-edge boundary, u8 -> f32, both outputs from a single pass.
(The north-star text calls this Sobel; the actual kernel is a plain central
difference — replicated as such.)

One fused XLA pass produces both outputs; batched over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def grad_xy(img, dtype=jnp.float32):
    """Compute (grad_x, grad_y) of a (..., H, W) u8 image as ``dtype``."""
    x = img.astype(dtype)
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(x, pad, mode="edge")
    gx = 0.5 * (p[..., 1:-1, 2:] - p[..., 1:-1, :-2])
    gy = 0.5 * (p[..., 2:, 1:-1] - p[..., :-2, 1:-1])
    return gx, gy
