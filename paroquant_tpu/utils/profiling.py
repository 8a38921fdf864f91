"""Tracing / profiling utilities (aux subsystem SURVEY.md §5.1).

The reference only has wall-clock GenerationStats; this adds real tracing:
- `trace(logdir)`: context manager around jax.profiler (TensorBoard-viewable)
- `StepTimer`: rolling per-step latency percentiles for the serving loop
- `annotate(name)`: TraceAnnotation for named regions inside a step
"""

from __future__ import annotations

import contextlib
import time
from collections import deque

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profile: `with trace('/tmp/prof'): step()`."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling wall-clock step timer with percentile summaries."""

    def __init__(self, window: int = 512):
        self.samples: deque[float] = deque(maxlen=window)
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.perf_counter() - self._t0)

    def summary(self) -> dict[str, float]:
        if not self.samples:
            return {}
        a = np.asarray(self.samples)
        return {
            "count": float(len(a)),
            "mean_ms": float(a.mean() * 1e3),
            "p50_ms": float(np.percentile(a, 50) * 1e3),
            "p99_ms": float(np.percentile(a, 99) * 1e3),
            "max_ms": float(a.max() * 1e3),
        }
