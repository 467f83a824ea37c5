"""Profiling / diagnostics hooks.

Reference: ``benchmarks/diagnostics/`` (SystemMonitor, PerformanceAnalyzer)
and ``reporting/JfrRecorder`` (Java Flight Recorder capture around runs).
The TPU equivalents: ``jax.profiler`` traces (viewable in XProf/TensorBoard),
HBM residency via live buffer stats, and the per-search structural counters
already returned in ``SearchResult``.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jvtpu_profile"):
    """Capture a device trace around a block (the JfrRecorder analog)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Live HBM stats for device 0 (SystemMonitor's max_heap analog)."""
    import jax

    dev = jax.devices()[0]
    stats = {}
    try:
        ms = dev.memory_stats()
        if ms:
            stats = {
                "bytes_in_use": ms.get("bytes_in_use"),
                "peak_bytes_in_use": ms.get("peak_bytes_in_use"),
                "bytes_limit": ms.get("bytes_limit"),
            }
    except Exception:
        pass
    return stats


class StepTimer:
    """Wall-clock section timing for build phases (PerformanceAnalyzer-lite)."""

    def __init__(self):
        self.sections: dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.sections[name] = self.sections.get(name, 0.0) + time.time() - t0

    def report(self) -> dict[str, float]:
        return {k: round(v, 3) for k, v in self.sections.items()}
