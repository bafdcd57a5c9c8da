"""Tracing and step timing.

The reference's only instrumentation is ad-hoc ``clock()`` spans printed as
"Time per image" (``/root/reference/src/test_multi.cpp:170,234,238``) and the
forest trainer's microsecond timer (``learning.cpp:1105``). Here that becomes
a structured utility: named step timers with streaming statistics, and a
``jax.profiler`` trace context for device-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional

import jax


@dataclass
class StepStats:
    count: int = 0
    total: float = 0.0
    minimum: float = float("inf")
    maximum: float = 0.0

    def add(self, seconds: float) -> None:
        self.count += 1
        self.total += seconds
        self.minimum = min(self.minimum, seconds)
        self.maximum = max(self.maximum, seconds)

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0


class StepTimer:
    """Named wall-clock spans with block-until-ready semantics.

    ``block=True`` waits for device results inside the span so the measured
    time covers the actual computation, not the async dispatch.
    """

    def __init__(self) -> None:
        self.stats: Dict[str, StepStats] = defaultdict(StepStats)

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            self.stats[name].add(time.perf_counter() - start)

    def time(self, name: str, fn, *args, block: bool = True, **kwargs):
        start = time.perf_counter()
        out = fn(*args, **kwargs)
        if block:
            out = jax.block_until_ready(out)
        self.stats[name].add(time.perf_counter() - start)
        return out

    def report(self) -> str:
        lines = [f"{'step':30s} {'count':>6s} {'mean ms':>9s} {'min':>8s} {'max':>8s}"]
        for name, s in sorted(self.stats.items()):
            lines.append(
                f"{name:30s} {s.count:6d} {s.mean * 1e3:9.2f} "
                f"{s.minimum * 1e3:8.2f} {s.maximum * 1e3:8.2f}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace scope; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
