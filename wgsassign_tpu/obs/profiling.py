"""Observability: per-phase wall-clock timers and jax profiler traces.

The reference has no tracing/profiling at all (SURVEY §5); this module adds
the run summary (parse / H2D / per-analysis phases) and an optional
TensorBoard/Perfetto trace via ``jax.profiler`` (``--profile DIR``).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class RunTimer:
    """Accumulating phase timer; prints a run summary."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self):
        if not self.totals:
            return
        print("\n-- timing summary --")
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            print(f"  {name:<14s} {total:8.3f}s  ({self.counts[name]}x)")


@contextlib.contextmanager
def maybe_profile(trace_dir):
    """Wrap a block in ``jax.profiler.trace`` when a directory is given."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(str(trace_dir)):
        yield
    print(f"Wrote profiler trace to {trace_dir}")
