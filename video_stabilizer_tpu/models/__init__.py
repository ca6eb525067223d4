"""Pipeline models: the aligner, trajectory smoother, stabilizer, and the
batched multi-stream variants."""

from video_stabilizer_tpu.models.aligner import (
    AlignerState,
    LevelSpec,
    VideoAligner,
    align_next_frame,
    init_state,
    level_specs,
)
from video_stabilizer_tpu.models.smoother import L1SmootherCenter, tvl1_smooth
from video_stabilizer_tpu.models.stabilizer import VideoStabilizer

__all__ = [
    "AlignerState", "LevelSpec", "VideoAligner", "align_next_frame",
    "init_state", "level_specs",
    "L1SmootherCenter", "tvl1_smooth",
    "VideoStabilizer",
]
