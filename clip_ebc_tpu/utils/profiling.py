"""Profiling and timing hooks.

The reference has no profiling at all (SURVEY §5: tqdm bars only). Here:
- :func:`trace` wraps ``jax.profiler.trace`` for TensorBoard-viewable
  device traces;
- :class:`StepTimer` measures steady-state step latency with correct
  device synchronization;
- :func:`annotate` adds named regions (``jax.profiler.TraceAnnotation``)
  so train-step phases show up in the trace viewer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a device trace into ``log_dir`` (view with TensorBoard)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with warmup discard and device sync."""

    def __init__(self, warmup_steps: int = 2) -> None:
        self.warmup = warmup_steps
        self.times = []
        self._t0: Optional[float] = None
        self._count = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> None:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    def summary(self, items_per_step: int = 1) -> Dict[str, float]:
        if not self.times:
            return {}
        import numpy as np

        t = np.asarray(self.times)
        return {
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "throughput": items_per_step / float(t.mean()),
        }
