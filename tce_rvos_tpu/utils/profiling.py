"""Profiling / tracing hooks.

The reference's observability is print-based iteration timing + max CUDA
memory (util/misc.py:224-276, SURVEY.md §5). TPU-native equivalents:

  * ``trace(logdir)`` — context manager around jax.profiler for XLA/TPU
    traces viewable in TensorBoard/Perfetto;
  * ``annotate(name)`` — TraceAnnotation so framework phases show up in the
    trace timeline;
  * ``device_memory_stats()`` — per-device live-bytes (replaces
    torch.cuda.max_memory_allocated in the step log);
  * ``StepTimer`` — host-side step/data timing with the same smoothed
    semantics the MetricLogger prints.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> Dict[str, int]:
    stats = {}
    for d in jax.local_devices():
        try:
            m = d.memory_stats()
            if m:
                stats[str(d)] = int(m.get("bytes_in_use", 0))
        except Exception:
            pass
    return stats


class StepTimer:
    def __init__(self):
        self.t_start: Optional[float] = None
        self.data_time = 0.0
        self.step_time = 0.0

    def data_loaded(self):
        now = time.perf_counter()
        if self.t_start is not None:
            self.data_time = now - self.t_start
        self.t_start = now

    def step_done(self):
        now = time.perf_counter()
        if self.t_start is not None:
            self.step_time = now - self.t_start
        self.t_start = now
