"""Profiling utilities — jax.profiler traces + tiles/sec counters.

The reference's observability is wall-clock prints scattered through its loops
(SURVEY.md §5 tracing row). Here:

  * :func:`trace` — context manager wrapping ``jax.profiler`` trace capture
    (viewable in TensorBoard/Perfetto) around any block;
  * :class:`Throughput` — rolling tiles/sec counter with
    ``block_until_ready``-accurate timing, the pipeline's north-star metric.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir: str | Path | None):
    """Capture a device trace into ``log_dir`` (no-op when None)."""
    if log_dir is None:
        yield
        return
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Rolling items/sec with optional device sync on the timed value."""

    def __init__(self, name: str = "tiles"):
        self.name = name
        self.count = 0
        self.t0 = time.perf_counter()

    def add(self, n: int, sync=None):
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        self.count += n
        return self

    @property
    def per_sec(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.count / dt if dt > 0 else 0.0

    def report(self) -> str:
        return f"{self.count} {self.name} at {self.per_sec:.1f}/s"
