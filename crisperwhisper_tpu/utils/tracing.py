"""Tracing, profiling and serving metrics.

The reference has NO instrumentation (SURVEY.md §5.1 — no timers or
profiler hooks anywhere). Here every pipeline stage can be annotated into
the XLA/jax profiler timeline and per-call RTF statistics are aggregated
for serving dashboards.
"""

from __future__ import annotations

import contextlib
import threading
import time
from dataclasses import dataclass, field
from typing import Iterator

import jax


@contextlib.contextmanager
def trace_span(name: str) -> Iterator[None]:
    """Host-side span that also lands in the jax profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


def start_profiler(logdir: str) -> None:
    jax.profiler.start_trace(logdir)


def stop_profiler() -> None:
    jax.profiler.stop_trace()


@dataclass
class StageStats:
    calls: int = 0
    total_s: float = 0.0
    max_s: float = 0.0

    def add(self, dt: float) -> None:
        self.calls += 1
        self.total_s += dt
        self.max_s = max(self.max_s, dt)

    @property
    def mean_s(self) -> float:
        return self.total_s / self.calls if self.calls else 0.0


@dataclass
class RTFMeter:
    """Aggregates realtime-factor metrics across pipeline calls.

    RTFx = audio seconds processed / wall seconds spent; >1 is faster
    than realtime (BASELINE.json target: >=200x per chip)."""

    audio_seconds: float = 0.0
    wall_seconds: float = 0.0
    stages: dict[str, StageStats] = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock,
                                  repr=False)

    @contextlib.contextmanager
    def measure(self, audio_seconds: float,
                stage: str = "pipeline") -> Iterator[None]:
        t0 = time.perf_counter()
        with trace_span(stage):
            yield
        dt = time.perf_counter() - t0
        with self._lock:
            self.audio_seconds += audio_seconds
            self.wall_seconds += dt
            self.stages.setdefault(stage, StageStats()).add(dt)

    @property
    def rtfx(self) -> float:
        return (self.audio_seconds / self.wall_seconds
                if self.wall_seconds else 0.0)

    def summary(self) -> dict:
        return {
            "audio_seconds": round(self.audio_seconds, 3),
            "wall_seconds": round(self.wall_seconds, 3),
            "rtfx": round(self.rtfx, 2),
            "stages": {k: {"calls": v.calls,
                           "mean_ms": round(v.mean_s * 1000, 2),
                           "max_ms": round(v.max_s * 1000, 2)}
                       for k, v in self.stages.items()},
        }


GLOBAL_METER = RTFMeter()
