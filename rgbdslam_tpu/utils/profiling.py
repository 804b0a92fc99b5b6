"""Per-stage timing + jax.profiler hooks.

Replaces the reference's minimal tracing (cv::TickMeter around the frame loop
+ mean-time HUD, main.cpp:38-47, SURVEY.md §5.1) with named stage timers and
optional on-device profiler traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class StageTimer:
    """Accumulates wall-time per named stage; device-synced when asked."""

    def __init__(self, sync: bool = False):
        self.sync = sync
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_result=None):
        t0 = time.perf_counter()
        yield
        if self.sync and sync_result is not None:
            jax.block_until_ready(sync_result)
        self.total[name] += time.perf_counter() - t0
        self.count[name] += 1

    def mean_ms(self, name: str) -> float:
        return 1e3 * self.total[name] / max(self.count[name], 1)

    def report(self) -> str:
        lines = []
        for name in sorted(self.total, key=lambda n: -self.total[n]):
            lines.append(
                f"{name:24s} {self.mean_ms(name):8.2f} ms/call "
                f"x{self.count[name]:5d} = {self.total[name]:7.2f} s"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace scope (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
