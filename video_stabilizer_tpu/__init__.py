"""video_stabilizer_tpu — a TPU-native (JAX/XLA/Pallas) video stabilization
framework with the capabilities of the C++/Halide reference
``catid/video_stabilizer``.

Layer map (TPU-native mirror of SURVEY.md §1):

  transforms.py      similarity-transform algebra ((...,4) arrays, vmappable)
  ops/               fused XLA/Pallas kernels (pyr_down, grad_xy, grad_argmax,
                     sparse_jac, sparse_ica, sparse_warpdiff, image_warp,
                     warp_image_bgr)
  models/aligner.py  the coarse-to-fine inverse-compositional LK aligner,
                     one jitted program per resolution
  models/smoother.py TV-L1 trajectory smoother (fixed-iteration lax loops)
  models/stabilizer.py  streaming orchestrator (frame delay, jitter
                     accumulation, decay, output warp)
  parallel/          device-mesh sharding of stream batches, vmapped sweeps
  utils/             video IO, jitter metric, profiling
"""

from video_stabilizer_tpu import transforms
from video_stabilizer_tpu.config import (
    AlignerParams,
    StabilizerParams,
    pyramid_shapes,
    tile_size_for,
)

__version__ = "0.1.0"

__all__ = [
    "transforms",
    "AlignerParams",
    "StabilizerParams",
    "pyramid_shapes",
    "tile_size_for",
]
