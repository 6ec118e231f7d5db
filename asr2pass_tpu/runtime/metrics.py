"""Serving metrics: per-stage latency + RTF + JAX profiler hooks.

The reference ships no tracing (SURVEY.md §5 — only snippet_time for
client-side RTF). This adds the observability the rebuild plan calls for:
pass-1 partial latency, pass-2 final latency, audio-seconds throughput, and
a context manager around jax.profiler for device traces.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, List


@dataclass
class StageStats:
    count: int = 0
    total_s: float = 0.0
    max_s: float = 0.0
    samples: List[float] = field(default_factory=list)
    _cap: int = 1000

    def add(self, dt: float):
        self.count += 1
        self.total_s += dt
        self.max_s = max(self.max_s, dt)
        if len(self.samples) < self._cap:
            self.samples.append(dt)

    @property
    def mean_s(self) -> float:
        return self.total_s / self.count if self.count else 0.0

    def percentile(self, p: float) -> float:
        if not self.samples:
            return 0.0
        s = sorted(self.samples)
        return s[min(len(s) - 1, int(p / 100 * len(s)))]


class Metrics:
    """Process-wide stage timers + audio accounting."""

    def __init__(self):
        self.stages: Dict[str, StageStats] = defaultdict(StageStats)
        self.audio_seconds = 0.0
        self.started = time.time()

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name].add(time.perf_counter() - t0)

    def add_audio(self, seconds: float):
        self.audio_seconds += seconds

    def report(self) -> dict:
        wall = time.time() - self.started
        out = {
            "uptime_s": round(wall, 1),
            "audio_seconds": round(self.audio_seconds, 1),
            "throughput_audio_s_per_s": round(
                self.audio_seconds / wall, 2) if wall else 0.0,
            "stages": {},
        }
        for name, st in self.stages.items():
            out["stages"][name] = {
                "count": st.count,
                "mean_ms": round(st.mean_s * 1000, 2),
                "p50_ms": round(st.percentile(50) * 1000, 2),
                "p95_ms": round(st.percentile(95) * 1000, 2),
                "max_ms": round(st.max_s * 1000, 2),
            }
        return out


GLOBAL = Metrics()


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace for TensorBoard (xprof) inspection."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
