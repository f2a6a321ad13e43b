"""Profiling and per-stage timing (SURVEY.md §5: the reference has only
wall-clock prints; the TPU build adds jax.profiler traces + stage timers)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Named wall-clock stage timing with device synchronization.

    Usage::

        t = StageTimer()
        with t.stage("decode"): ...
        with t.stage("enhance"): out = fn(x); out.block_until_ready()
        print(t.summary())
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_on: Optional[object] = None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None and hasattr(sync_on, "block_until_ready"):
                sync_on.block_until_ready()
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<20} total {total * 1e3:8.1f} ms   "
                         f"x{n}   avg {total / n * 1e3:8.2f} ms")
        return "\n".join(lines)
