"""Device-aware timing (reference: xforecasting get_time_function,
scalability_plot.py:65 CUDA-sync timing -> here block_until_ready)."""

from __future__ import annotations

import time
from typing import List

import jax

__all__ = ["device_sync", "Timer"]


def device_sync(x=None):
    """Block until device work is done (CUDA-synchronize equivalent)."""
    if x is not None:
        jax.block_until_ready(x)
    else:
        jax.device_put(0.0).block_until_ready()


class Timer:
    """Median-of-N wall-time measurement with device sync."""

    def __init__(self):
        self.samples: List[float] = []

    def measure(self, fn, n: int = 10, warmup: int = 2):
        for _ in range(warmup):
            device_sync(fn())
        self.samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            device_sync(fn())
            self.samples.append(time.perf_counter() - t0)
        return self.median

    @property
    def median(self) -> float:
        s = sorted(self.samples)
        return s[len(s) // 2]
