"""Tracing & profiling utilities (SURVEY.md §5: the reference has none — its
``indicatif`` progress-bar dependency is declared but never used,
reference Cargo.toml:11).

Thin wrappers over ``jax.profiler`` so pipeline stages show up as named spans
in TPU traces, plus a process-local wall-clock stage timer that works with the
async dispatch model (explicitly blocks on results when asked).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class StageTimes:
    """Accumulates wall-clock per named stage; thread-unsafe by design (one per
    pipeline instance)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        """Times a stage. ``block_on`` (optional pytree of arrays) is
        block_until_ready'd before the clock stops so device work is counted."""
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_s": self.totals[k] / max(self.counts[k], 1)}
            for k in sorted(self.totals)
        }


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """Capture a device profile (Perfetto/TensorBoard) around a region when
    ``log_dir`` is given; no-op otherwise."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator: wrap a function in a named profiler span."""

    def deco(fn):
        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        wrapped.__name__ = getattr(fn, "__name__", name)
        return wrapped

    return deco
