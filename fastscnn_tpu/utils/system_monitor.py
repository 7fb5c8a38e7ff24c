"""Host + device resource sampling for the dashboards.

TPU-native port of the reference's system-monitor thread
(reference:lane_dashboard.py:380-), which scrapes psutil CPU/mem and
``npu-smi`` into ``/api/stats``.  Here the host side uses psutil when
present with a stdlib ``/proc`` fallback, and the device side asks the
PJRT client directly (``jax.local_devices()[0].memory_stats()``) — the
TPU analog of ``npu-smi`` — so the payload works on any box the
framework runs on, with no subprocess scraping.

Sampling is on-demand (per HTTP request) rather than a 2-second daemon
thread: the handler thread pool already gives request isolation and the
reads are microseconds, so there is nothing for a poller to amortize.
"""

from __future__ import annotations

import threading

__all__ = ["host_stats", "device_stats"]

_lock = threading.Lock()
_prev_cpu: tuple[float, float] | None = None  # (busy, total) jiffy totals


def _proc_cpu_sample() -> tuple[float, float] | None:
    try:
        with open("/proc/stat") as f:
            fields = f.readline().split()[1:]
        vals = [float(v) for v in fields]
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0.0)  # idle + iowait
        total = sum(vals)
        return total - idle, total
    except (OSError, ValueError, IndexError):
        return None


def _proc_meminfo() -> dict | None:
    try:
        info = {}
        with open("/proc/meminfo") as f:
            for line in f:
                key, _, rest = line.partition(":")
                info[key] = float(rest.split()[0])  # kB
        total = info["MemTotal"]
        avail = info.get("MemAvailable", info.get("MemFree", 0.0))
        return {
            "mem_percent": round(100.0 * (1.0 - avail / total), 1),
            "mem_total_mb": round(total / 1024.0, 1),
            "mem_available_mb": round(avail / 1024.0, 1),
        }
    except (OSError, ValueError, KeyError):
        return None


def host_stats() -> dict:
    """CPU %, memory % / MB.  psutil when installed; /proc fallback.

    The CPU percentage is a delta since the previous call (psutil's
    ``interval=None`` semantics) — the first call reports 0.0.
    """
    try:
        import psutil

        vm = psutil.virtual_memory()
        return {
            "cpu_percent": psutil.cpu_percent(interval=None),
            "mem_percent": vm.percent,
            "mem_total_mb": round(vm.total / 2**20, 1),
            "mem_available_mb": round(vm.available / 2**20, 1),
        }
    except Exception:
        pass
    out: dict = {"cpu_percent": 0.0}
    global _prev_cpu
    sample = _proc_cpu_sample()
    if sample is not None:
        with _lock:
            if _prev_cpu is not None:
                dbusy = sample[0] - _prev_cpu[0]
                dtotal = sample[1] - _prev_cpu[1]
                if dtotal > 0:
                    out["cpu_percent"] = round(100.0 * dbusy / dtotal, 1)
            _prev_cpu = sample
    mem = _proc_meminfo()
    if mem is not None:
        out.update(mem)
    return out


def device_stats() -> dict:
    """Accelerator identity + memory from the PJRT client.

    Returns ``{}`` when jax has not been imported yet by this process —
    the monitor must never be the thing that initializes a backend (a
    TPU claim from a stats poll would contend with the serving process
    that owns the chip).
    """
    import sys

    jax = sys.modules.get("jax")
    if jax is None:
        return {}
    try:
        # a live backend must already exist: jax.local_devices() would
        # otherwise *initialize* one right here (and on this sandbox a
        # TPU claim from a stats poll wedges the process that owns the
        # chip). If liveness can't be determined, stay silent.
        from jax._src import xla_bridge as _xb

        if not getattr(_xb, "_backends", None):
            return {}
        dev = jax.local_devices()[0]
    except Exception:
        return {}
    out = {"platform": dev.platform, "device_kind": dev.device_kind,
           "device_count": jax.local_device_count()}
    try:
        mem = dev.memory_stats()  # None on backends without allocator stats
    except Exception:
        mem = None
    if mem:
        for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
                    "largest_alloc_size"):
            if key in mem:
                out[key] = int(mem[key])
        if "bytes_in_use" in mem and mem.get("bytes_limit"):
            out["mem_percent"] = round(
                100.0 * mem["bytes_in_use"] / mem["bytes_limit"], 1
            )
    return out
