"""Tracing & profiling (SURVEY §5: the reference has only wall-clock
prints around Stage 1 — DepthPrompting.py:71,84-85).

Three layers:
  * ``StageTimer`` — hierarchical wall-clock spans with a summary table;
  * ``trace(path)`` — context manager around jax.profiler for on-device
    traces (open in TensorBoard / xprof);
  * ``annotate(name)`` — TraceAnnotation passthrough so spans show up
    inside device traces.

Usage:
    timer = StageTimer()
    with timer.span("stage1"):
        ...
    timer.report()
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional, Tuple


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._stack: List[str] = []

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        full = "/".join(self._stack + [name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[full] += dt
            self.counts[full] += 1
            self._stack.pop()

    def report(self, min_total: float = 0.0) -> str:
        lines = ["span                                    total_s   calls   mean_ms"]
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t, c = self.totals[name], self.counts[name]
            if t < min_total:
                continue
            lines.append(f"{name:<40}{t:8.2f}{c:8d}{t / c * 1000:10.1f}")
        out = "\n".join(lines)
        print(out)
        return out

    def as_dict(self) -> Dict[str, Tuple[float, int]]:
        return {k: (self.totals[k], self.counts[k]) for k in self.totals}


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Device trace via jax.profiler when logdir is set; no-op otherwise."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside device traces (jax.profiler.TraceAnnotation)."""
    try:
        import jax
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield
