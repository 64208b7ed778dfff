"""Tracing & stage timing (SURVEY.md §5 tracing/profiling row).

The reference's only observability is a TensorBoard callback; this module
provides the TPU-native equivalents:

* ``trace(logdir)`` — context manager around `jax.profiler.trace`
  (XProf/Perfetto-compatible; view with TensorBoard's profile plugin).
* ``annotate(name)`` — `jax.profiler.TraceAnnotation` for host-side stages
  (range coding, bitstream IO) so they appear on the trace timeline next to
  the device stream and the overlap claims of the coding pipeline can be
  *seen*, not asserted.
* ``StageTimer`` — lightweight wall-clock accounting per pipeline stage
  with an aggregate report (for environments without a trace viewer).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax

__all__ = ["trace", "annotate", "StageTimer"]


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Captures a device+host profile into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host-side region, visible in the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulates wall time per named stage; `report()` prints a table.

    Thread-safe: pipeline host stages run on worker threads
    (:mod:`compression_tpu.parallel.pipeline`)."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        with annotate(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                dt = time.perf_counter() - t0
                with self._lock:
                    self.totals[name] += dt
                    self.counts[name] += 1

    def report(self) -> str:
        lines = ["stage                     total_s   calls   mean_ms"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:24s} {t:8.3f} {c:7d} {1000*t/c:9.2f}")
        return "\n".join(lines)
