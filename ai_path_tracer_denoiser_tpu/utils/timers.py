"""Performance timing.

Equivalent of Common::PerformanceTimer (common.h:27-111): paired host and
device timers.  On TPU, "device time" is measured by block_until_ready
bracketing (XLA runs async); jax.profiler traces are the deeper tool.
"""
from __future__ import annotations

import time
from typing import Optional

import jax


class PerformanceTimer:
    def __init__(self):
        self._cpu_start: Optional[float] = None
        self._dev_start: Optional[float] = None
        self.cpu_elapsed_ms: float = 0.0
        self.dev_elapsed_ms: float = 0.0

    # --- CPU timer (common.h:37-55) ---
    def start_cpu(self):
        self._cpu_start = time.perf_counter()

    def end_cpu(self) -> float:
        assert self._cpu_start is not None
        self.cpu_elapsed_ms = (time.perf_counter() - self._cpu_start) * 1e3
        self._cpu_start = None
        return self.cpu_elapsed_ms

    # --- device timer (common.h:57-77: cudaEvent equivalent) ---
    def start_device(self):
        # drain queued work so we time only what follows
        jax.effects_barrier()
        self._dev_start = time.perf_counter()

    def end_device(self, *results) -> float:
        assert self._dev_start is not None
        for r in results:
            jax.block_until_ready(r)
        self.dev_elapsed_ms = (time.perf_counter() - self._dev_start) * 1e3
        self._dev_start = None
        return self.dev_elapsed_ms


def time_jitted(fn, *args, warmup: int = 1, iters: int = 10) -> float:
    """Median wall ms per call of an already-jitted fn (compile excluded)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2]
