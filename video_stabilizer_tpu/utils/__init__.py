"""Host-side utilities: video IO, the jitter evaluation metric, and the
performance-metrics tracer."""

from video_stabilizer_tpu.utils.metrics import PerformanceMetrics, time_function
from video_stabilizer_tpu.utils import io
from video_stabilizer_tpu.utils.jitter import median_jitter_px

__all__ = ["PerformanceMetrics", "time_function", "io", "median_jitter_px"]
