"""Structured per-stage metrics and timing.

The reference's only observability is interleaved prints + tic/toc
(``processor.py:305-489``, SURVEY.md §5.1/§5.5). Here each pipeline stage
records wall-clock and counters into a dict that ``process`` returns, and a
``trace`` context manager wraps stages in ``jax.profiler``-visible named
scopes for XProf/Perfetto traces.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Any, Dict

logger = logging.getLogger("meatmodeler")

__all__ = ["Metrics", "trace", "logger"]


class Metrics:
    """Accumulates per-stage wall times and arbitrary counters."""

    def __init__(self) -> None:
        self.timings: Dict[str, float] = {}
        self.counters: Dict[str, Any] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        with trace(name):
            yield
        dt = time.perf_counter() - t0
        self.timings[name] = self.timings.get(name, 0.0) + dt
        logger.info("%s: %.3fs", name, dt)

    def count(self, name: str, value) -> None:
        self.counters[name] = value
        logger.info("%s = %s", name, value)

    def as_dict(self) -> Dict[str, Any]:
        return {"timings": dict(self.timings), "counters": dict(self.counters)}


@contextlib.contextmanager
def trace(name: str):
    """jax named scope + profiler annotation (no-op cost when not profiling)."""
    import jax

    with jax.named_scope(name), jax.profiler.TraceAnnotation(name):
        yield
