"""Timers and memory monitoring.

ScopedTimer mirrors include/scoped_timer.h (RAII wall-clock accumulator);
monitor() mirrors the reference's VmPeak/VmSize/VmHWM/VmRSS checkpoints
(multigrid_throughput.cc:337-368), extended with device-memory stats.
"""

from __future__ import annotations

import time


class ScopedTimer:
    """RAII wall-clock accumulator: adds the elapsed seconds to a slot.

    >>> acc = [0.0]
    >>> with ScopedTimer(acc): ...
    """

    def __init__(self, accumulator: list, index: int = 0):
        self._acc = accumulator
        self._idx = index

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._acc[self._idx] += time.perf_counter() - self._t0
        return False


def host_memory_stats() -> dict:
    """VmPeak/VmSize/VmHWM/VmRSS in MB from /proc/self/status."""
    out = {}
    try:
        with open("/proc/self/status") as f:
            for line in f:
                for key in ("VmPeak", "VmSize", "VmHWM", "VmRSS"):
                    if line.startswith(key + ":"):
                        out[key] = int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return out


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            if s:
                out[str(d)] = {
                    "bytes_in_use": s.get("bytes_in_use"),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                }
        except Exception:
            pass
    return out


_MONITOR_ENABLED = False


def set_monitor(enabled: bool) -> None:
    global _MONITOR_ENABLED
    _MONITOR_ENABLED = enabled


def monitor(label: str) -> None:
    """Labelled memory checkpoint (disabled by default, like the reference's
    early-return monitor(), multigrid_throughput.cc:337-341)."""
    if not _MONITOR_ENABLED:
        return
    host = host_memory_stats()
    print(
        f"[monitor] {label}: "
        + " ".join(f"{k}={v:.0f}MB" for k, v in host.items())
    )
