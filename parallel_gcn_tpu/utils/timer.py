"""Wall-clock timers with device synchronization.

The reference keeps enum-indexed host timers (include/timer.h, src/timer.cpp)
that cannot time async CUDA kernels; here every stop() forces a device sync via
host materialization, so the numbers mean what they say. For per-op device
timing use utils/profiling.py instead.
"""

from __future__ import annotations

import time
from collections import defaultdict

import numpy as np


class Timer:
    """Named accumulating timers (reference: timer_start/stop/total)."""

    def __init__(self):
        self._starts: dict[str, float] = {}
        self._totals: dict[str, float] = defaultdict(float)
        self._counts: dict[str, int] = defaultdict(int)

    def start(self, name: str) -> None:
        self._starts[name] = time.perf_counter()

    def stop(self, name: str, sync_value=None) -> float:
        """Stop ``name``; pass a jax array as ``sync_value`` to block on the
        device before reading the clock."""
        if sync_value is not None:
            np.asarray(sync_value)
        dt = time.perf_counter() - self._starts.pop(name)
        self._totals[name] += dt
        self._counts[name] += 1
        return dt

    def total(self, name: str) -> float:
        return self._totals[name]

    def average(self, name: str) -> float:
        return self._totals[name] / max(self._counts[name], 1)

    def report(self) -> str:
        lines = [
            f"{name}: total={self._totals[name]:.6f}s "
            f"avg={self.average(name) * 1e3:.4f}ms n={self._counts[name]}"
            for name in sorted(self._totals)
        ]
        return "\n".join(lines)
