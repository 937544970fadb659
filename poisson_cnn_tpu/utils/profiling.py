"""Profiling and observability helpers.

The reference has no profiler integration — only ad-hoc time.time() loops in
module __main__ blocks (SURVEY.md §5). Here: a jax.profiler trace context, a
step timer with solves/sec accounting, and a simple metrics logger used by the
training loop.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/poisson_cnn_tpu_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput accounting for jitted steps (call `tick` after
    block_until_ready)."""

    def __init__(self, items_per_step: int = 1, warmup: int = 2):
        self.items_per_step = items_per_step
        self.warmup = warmup
        self._count = 0
        self._t0 = None

    def tick(self):
        self._count += 1
        if self._count == self.warmup:
            self._t0 = time.perf_counter()

    @property
    def steps_per_sec(self) -> float:
        measured = self._count - self.warmup
        if self._t0 is None or measured <= 0:
            return float("nan")
        return measured / (time.perf_counter() - self._t0)

    @property
    def items_per_sec(self) -> float:
        return self.steps_per_sec * self.items_per_step


def benchmark(fn, *args, iters: int = 20, warmup: int = 2) -> float:
    """Mean seconds per call of a jitted fn (blocks on the result)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


class MetricsLogger:
    """Append-only JSONL metrics log (loss/lr/throughput per epoch)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path

    def log(self, **metrics):
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(metrics) + "\n")
