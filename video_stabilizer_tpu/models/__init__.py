"""Pipeline models: the aligner, trajectory smoother, stabilizer, and the
batched multi-stream variants."""

from video_stabilizer_tpu.models.aligner import (
    AlignerState,
    DynAlignParams,
    LevelSpec,
    VideoAligner,
    align_next_frame,
    init_state,
    level_specs,
)
from video_stabilizer_tpu.models.batch import (
    align_clip,
    stabilize_clip,
    stabilize_streams,
)
from video_stabilizer_tpu.models.chunked import (
    ChunkedStabilizer,
    StreamState,
    init_stream_state,
    stabilize_stream_chunked,
)
from video_stabilizer_tpu.models.homography_aligner import (
    align_clip_homography,
    stabilize_clip_homography,
)
from video_stabilizer_tpu.models.smoother import L1SmootherCenter, tvl1_smooth
from video_stabilizer_tpu.models.stabilizer import VideoStabilizer

__all__ = [
    "AlignerState", "DynAlignParams", "LevelSpec", "VideoAligner",
    "align_next_frame", "init_state", "level_specs",
    "align_clip", "stabilize_clip", "stabilize_streams",
    "ChunkedStabilizer", "StreamState", "init_stream_state",
    "stabilize_stream_chunked",
    "align_clip_homography", "stabilize_clip_homography",
    "L1SmootherCenter", "tvl1_smooth",
    "VideoStabilizer",
]
