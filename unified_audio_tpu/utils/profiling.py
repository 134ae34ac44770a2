"""Tracing / profiling helpers (aux subsystem the reference lacks, SURVEY §5.1).

Wraps jax.profiler: capture device traces around any callable or block and
report simple step timings. Usage:

    with trace("/tmp/tb"):        # open in TensorBoard / xprof
        step()

    timer = StepTimer()
    for batch in data:
        with timer:
            step(batch)
    print(timer.summary())
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in xprof traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timer with p50/p90 summary (blocks on device work)."""

    def __init__(self, skip_first: int = 1):
        self.times: List[float] = []
        self.skip_first = skip_first
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        times = sorted(self.times[self.skip_first:] or self.times)
        n = len(times)
        return {
            "steps": n,
            "mean_s": sum(times) / n,
            "p50_s": times[n // 2],
            "p90_s": times[min(n - 1, int(n * 0.9))],
            "min_s": times[0],
        }
