"""Structured metrics and profiling helpers.

The reference threads tic/toc wall times and function-eval counters
through every phase (SURVEY.md §5.1: amen_cross_s.m:61-62,
als_cross_parametric.m:43-45, IRTstruct.evalcnt).  Here eval counters
are first-class outputs of the constructors already; this module adds
lightweight timers and a hook into jax.profiler for device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax

__all__ = ["Metrics", "trace"]


class Metrics:
    """Accumulating wall-clock timers + counters."""

    def __init__(self):
        self.times: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def add(self, name: str, value: int = 1):
        self.counts[name] += value

    def report(self) -> str:
        lines = []
        for k in sorted(set(self.times) | set(self.counts)):
            t = self.times.get(k)
            c = self.counts.get(k)
            parts = [k]
            if t is not None and t > 0:
                parts.append(f"{t:.3f}s")
            if c:
                parts.append(f"x{c}")
            lines.append("  ".join(parts))
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
