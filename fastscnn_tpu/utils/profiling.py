"""Per-stage timing with the reference's performance-report format.

Port of the ``times_dict`` pattern and ``print_performance_analysis``
(reference:onnx_single_image_inference.py:320-340,
reference:kuruma/core/inference.py:71-91): every pipeline stage records
wall time; the report prints per-stage ms, percentage breakdown, and the
theoretical FPS implied by the total.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

__all__ = ["PerfTimer", "enable_compilation_cache", "device_trace"]


class PerfTimer:
    def __init__(self):
        self.times: dict[str, float] = {}
        self._order: list[str] = []

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            if name not in self._order:
                self._order.append(name)

    def record(self, name: str, seconds: float):
        self.times[name] = self.times.get(name, 0.0) + seconds
        if name not in self._order:
            self._order.append(name)

    @property
    def total(self) -> float:
        return sum(self.times.values())

    def report(self, title: str = "Performance analysis") -> str:
        total = self.total
        lines = [f"=== {title} ==="]
        for name in self._order:
            t = self.times[name]
            pct = 100.0 * t / total if total > 0 else 0.0
            lines.append(f"  {name:<24s} {t * 1e3:8.1f} ms  ({pct:5.1f}%)")
        lines.append(f"  {'TOTAL':<24s} {total * 1e3:8.1f} ms")
        if total > 0:
            lines.append(f"  theoretical FPS: {1.0 / total:.1f}")
        return "\n".join(lines)

    def print_performance_analysis(self, title: str = "Performance analysis"):
        print(self.report(title))


_CACHE_ENABLED: list = []


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Turn on JAX's persistent XLA compilation cache (idempotent).

    First compilation of each (program, shape) costs 20-40 s through
    this sandbox's TPU relay; the persistent cache reuses compiled
    executables across processes, so repeat CLI/bench invocations start
    hot. Called automatically when the inference engine or the sharded
    train-step modules load. No-op when ``FASTSCNN_NO_COMPILATION_CACHE``
    is set truthy or the backend refuses serialization (returns None).

    The cache directory is namespaced by a HOST CPU fingerprint: XLA:CPU
    AOT executables bake in the compile host's machine features (AVX512
    variants, AMX, ...) and XLA's cache key does NOT include them, so a
    cache shared across heterogeneous hosts (this sandbox's VMs migrate)
    loads foreign-host code — the loader warns "could lead to execution
    errors such as SIGILL", and a mixed hit/miss pair of executables can
    even disagree numerically (observed once as a grad-accum parity test
    flake: the scan step compiled natively, the unrolled reference loaded
    a foreign blob). One warm-up per distinct host type is the price.

    Note: even a SAME-host cache hit logs the loader's "machine feature
    +prefer-no-scatter/+prefer-no-gather is not supported on the host
    machine ... could lead to SIGILL" error line. Those two are XLA
    codegen *preferences* baked into the AOT blob's feature string, not
    CPU ISA extensions, and the host probe never reports them — the
    comparison is spuriously asymmetric. With this fingerprint
    namespacing in place the warning is noise, not a fault.
    """
    import hashlib
    import os
    import platform as _platform

    if _CACHE_ENABLED:
        return _CACHE_ENABLED[0]

    if os.environ.get("FASTSCNN_NO_COMPILATION_CACHE", "").lower() not in (
        "", "0", "false", "no",
    ):
        return None
    path = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.cache/fastscnn_tpu/xla")
    )
    try:
        flags = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
        host = hashlib.sha1(
            (_platform.machine() + flags).encode()
        ).hexdigest()[:12]
    except OSError:
        host = _platform.machine() or "unknown-host"
    path = os.path.join(path, host)
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _CACHE_ENABLED.append(path)
        return path
    except Exception:
        return None


@contextmanager
def device_trace(outdir: str):
    """Capture a ``jax.profiler`` device trace (XPlane/TensorBoard format)
    for everything executed inside the block — the TPU-native analogue of
    the reference's wall-clock stage timers for *inside-the-program*
    analysis (view with TensorBoard's profile plugin or xprof)."""
    import jax

    jax.profiler.start_trace(outdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
