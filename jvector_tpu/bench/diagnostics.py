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


def run_metadata(config: dict | None = None) -> dict:
    """Run provenance for bench rows (reference ``GitInfo``/``SysInfoWriter``).

    Returns git sha/dirty flag, device, jax version, host info and an
    optional config hash so every reported row can be traced to the exact
    code + machine + parameters that produced it.
    """
    import hashlib
    import json
    import platform
    import subprocess

    import jax

    def _git(*args):
        try:
            return (
                subprocess.run(
                    ["git", *args],
                    capture_output=True,
                    timeout=5,
                    cwd=os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                )
                .stdout.decode()
                .strip()
            )
        except Exception:
            return ""

    sha = _git("rev-parse", "HEAD")
    dirty = bool(_git("status", "--porcelain"))
    meta = {
        "git_sha": sha[:12],
        "git_dirty": dirty,
        "device": str(jax.devices()[0]),
        "backend": jax.default_backend(),
        "jax_version": jax.__version__,
        "hostname": platform.node(),
        "platform": platform.platform(),
        "cpu_count": os.cpu_count(),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
    }
    if config is not None:
        blob = json.dumps(config, sort_keys=True, default=str).encode()
        meta["config_hash"] = hashlib.sha256(blob).hexdigest()[:12]
    return meta


class SystemMonitor:
    """Background host CPU/memory sampler (reference ``SystemMonitor``).

    Samples /proc/stat + /proc/meminfo on a thread; ``report()`` returns
    avg/max CPU utilization and min available memory over the run.
    """

    def __init__(self, interval_s: float = 1.0):
        self.interval_s = interval_s
        self._samples: list[tuple[float, float]] = []  # (cpu_util, avail_kb)
        self._stop = None
        self._thread = None

    @staticmethod
    def _cpu_times():
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
        return idle, sum(vals)

    @staticmethod
    def _mem_available_kb():
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1])
        return 0

    def __enter__(self):
        import threading

        self._stop = threading.Event()

        def loop():
            prev_idle, prev_total = self._cpu_times()
            while not self._stop.wait(self.interval_s):
                idle, total = self._cpu_times()
                d_total = max(total - prev_total, 1)
                util = 1.0 - (idle - prev_idle) / d_total
                prev_idle, prev_total = idle, total
                self._samples.append((util, self._mem_available_kb()))

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=2)

    def report(self) -> dict:
        if not self._samples:
            return {"cpu_avg": 0.0, "cpu_max": 0.0, "mem_min_available_mb": 0.0}
        cpus = [s[0] for s in self._samples]
        mems = [s[1] for s in self._samples]
        return {
            "cpu_avg": round(sum(cpus) / len(cpus), 3),
            "cpu_max": round(max(cpus), 3),
            "mem_min_available_mb": round(min(mems) / 1024, 1),
        }


class DiskUsageMonitor:
    """Delta of disk usage under a path across a run (``DiskUsageMonitor``)."""

    def __init__(self, path: str):
        self.path = path
        self._start = 0

    @staticmethod
    def _usage(path) -> int:
        total = 0
        for root, _, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return total

    def __enter__(self):
        self._start = self._usage(self.path)
        return self

    def __exit__(self, *exc):
        pass

    def delta_bytes(self) -> int:
        return self._usage(self.path) - self._start
