"""Lightweight stage timers + JAX profiler hooks.

The reference has no tracing/profiling (SURVEY §5); this gives the rebuild
per-stage wall timers (device-synchronized) and a convenience wrapper around
`jax.profiler` trace capture for xprof.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class StageTimers:
    """Accumulating named wall timers with device sync at boundaries."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str, sync=None):
        """`sync`: optional array/pytree to block on before stopping the
        clock (so async-dispatched device work is attributed correctly)."""
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            if "sync" in holder or sync is not None:
                import jax
                jax.block_until_ready(holder.get("sync", sync))
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda k: -self.totals[k]):
            n = self.counts[name]
            lines.append(f"{name:32s} {self.totals[name]:8.2f}s"
                         f"  x{n}  ({self.totals[name] / n * 1000:8.1f} ms avg)")
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """Capture an xprof trace around a block (view with xprof/tensorboard)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
