"""Tracing / profiling hooks (SURVEY.md §5).

The reference has wall-clock timers at best; here: jax.profiler traces
(viewable in XProf/TensorBoard or Perfetto) plus a throughput meter that
reports the BASELINE metric (grid-points/s) per run section.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(outdir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into ``outdir`` (no-op when outdir is None)."""
    if not outdir:
        yield
        return
    import jax

    jax.profiler.start_trace(outdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Accumulates (points, steps, seconds) and reports points/s."""

    def __init__(self, npoints: int):
        self.npoints = npoints
        self.steps = 0
        self.seconds = 0.0

    @contextlib.contextmanager
    def section(self, nsteps: int) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds += time.perf_counter() - t0
            self.steps += nsteps

    @property
    def points_per_second(self) -> float:
        return self.npoints * self.steps / max(self.seconds, 1e-12)

    def report(self) -> str:
        return json.dumps({
            "steps": self.steps,
            "seconds": round(self.seconds, 4),
            "points_per_second": round(self.points_per_second, 1),
        })


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
