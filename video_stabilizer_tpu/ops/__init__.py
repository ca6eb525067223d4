"""TPU-native compute kernels (JAX/XLA, with Pallas variants for hot paths).

This package is the analog of the reference's Halide generator layer
(generators.cpp) — but expressed as fused, batched, statically-shaped XLA
programs rather than AOT-compiled C-ABI objects. The analog of the checked-in
Halide schedules (schedules/*.h) is each kernel's block/tiling parameters,
recorded in code next to the kernel.
"""

from video_stabilizer_tpu.ops.lanczos import lanczos2, lanczos2_exact
from video_stabilizer_tpu.ops.pyr_down import pyr_down, build_pyramid
from video_stabilizer_tpu.ops.grad import grad_xy
from video_stabilizer_tpu.ops.argmax import grad_argmax, tile_view, take_at_tile_argmax
from video_stabilizer_tpu.ops.warp import (
    image_warp,
    image_warp_ul,
    warp_image_bgr,
    warp_by_similarity_transform,
)
from video_stabilizer_tpu.ops.sparse import (
    sparse_jacobian,
    sparse_warp_sample,
    sparse_warpdiff,
    sparse_ica,
)
from video_stabilizer_tpu.ops.fast_warp import (
    warp_field_fast,
    warp_homography_fast,
    warp_image_fast,
)
from video_stabilizer_tpu.ops.phase_corr import phase_correlate
from video_stabilizer_tpu.ops.select import histogram_mask, topk_mask
from video_stabilizer_tpu.ops.linalg import eigh_sym, regularized_pinv_sym4

__all__ = [
    "lanczos2", "lanczos2_exact",
    "pyr_down", "build_pyramid",
    "grad_xy",
    "grad_argmax", "tile_view", "take_at_tile_argmax",
    "image_warp", "image_warp_ul", "warp_image_bgr", "warp_by_similarity_transform",
    "sparse_jacobian", "sparse_warp_sample", "sparse_warpdiff", "sparse_ica",
    "warp_field_fast", "warp_homography_fast", "warp_image_fast",
    "phase_correlate", "histogram_mask", "topk_mask",
    "eigh_sym", "regularized_pinv_sym4",
]
