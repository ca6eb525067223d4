"""Performance tracing.

TPU-native analog of the reference's compile-time-gated PerformanceMetrics
singleton + TimerGuard RAII + TIME_FUNCTION macro (alignment.cpp:10-147):
a process-wide registry of labeled timers and scalar metrics with
avg/total/min/max/count reporting, enabled at runtime instead of compile
time, plus hooks into jax.profiler for device-side traces.

The label taxonomy mirrors the reference's instrumentation points
("ComputePyramid", "PyramidLevel_i", "ICAIteration_i_j", ...), so profiles
are comparable stage-by-stage.
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field
from typing import Dict


@dataclass
class _Metric:
    total: float = 0.0
    count: int = 0
    min: float = float("inf")
    max: float = float("-inf")

    def add(self, v: float):
        self.total += v
        self.count += 1
        self.min = min(self.min, v)
        self.max = max(self.max, v)

    @property
    def avg(self):
        return self.total / max(self.count, 1)


@dataclass
class PerformanceMetrics:
    """Labeled wall-clock timers + custom scalar metrics.

    Enabled via the VIDSTAB_METRICS=1 env var or ``enabled=True``; when
    disabled, the context manager is a no-op (the analog of TIME_FUNCTION
    expanding to ``;`` — alignment.cpp:145-147).
    """

    enabled: bool = field(
        default_factory=lambda: os.environ.get("VIDSTAB_METRICS", "0") == "1")
    timers: Dict[str, _Metric] = field(default_factory=dict)
    custom: Dict[str, _Metric] = field(default_factory=dict)

    _instance = None

    @classmethod
    def instance(cls) -> "PerformanceMetrics":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    @contextlib.contextmanager
    def timer(self, label: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            ms = (time.perf_counter() - t0) * 1e3
            self.timers.setdefault(label, _Metric()).add(ms)

    def log_metric(self, label: str, value: float):
        if self.enabled:
            self.custom.setdefault(label, _Metric()).add(float(value))

    def report(self) -> str:
        lines = ["==== PERFORMANCE METRICS ===="]
        hdr = f"{'label':<40}{'avg(ms)':>12}{'total(ms)':>12}{'calls':>8}{'min':>10}{'max':>10}"
        lines.append(hdr)
        for name in sorted(self.timers):
            m = self.timers[name]
            lines.append(f"{name:<40}{m.avg:>12.3f}{m.total:>12.3f}"
                         f"{m.count:>8d}{m.min:>10.3f}{m.max:>10.3f}")
        if self.custom:
            lines.append("==== CUSTOM METRICS ====")
            for name in sorted(self.custom):
                m = self.custom[name]
                lines.append(f"{name:<40}{m.avg:>12.3f}{m.total:>12.3f}"
                             f"{m.count:>8d}{m.min:>10.3f}{m.max:>10.3f}")
        return "\n".join(lines)

    def reset(self):
        self.timers.clear()
        self.custom.clear()


def time_function(label: str):
    """Shortcut: ``with time_function("PyramidLevel_3"): ...``."""
    return PerformanceMetrics.instance().timer(label)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace wrapper for device-side timelines (the analog of
    the reference's per-kernel timers, but with real TPU step markers)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
