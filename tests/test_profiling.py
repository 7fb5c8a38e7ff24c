"""Tests for utils/profiling.py — the persistent-cache host namespacing.

Regression context: XLA:CPU AOT executables bake in the compile host's
machine features and XLA's cache key does not include them, so a cache
directory shared across this sandbox's heterogeneous VMs loaded
foreign-host code (AOT loader: "could lead to execution errors such as
SIGILL") and once produced a numeric parity-test flake. The cache dir
must therefore be namespaced per host fingerprint.
"""

import os
import re

import pytest

from fastscnn_tpu.utils import profiling


@pytest.fixture
def fresh_cache_state(monkeypatch, tmp_path):
    """Reset the idempotency latch so enable_compilation_cache re-runs,
    and point the base dir at a tmp path (restores jax config after)."""
    import jax

    monkeypatch.setattr(profiling, "_CACHE_ENABLED", [])
    monkeypatch.delenv("FASTSCNN_NO_COMPILATION_CACHE", raising=False)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    old = jax.config.jax_compilation_cache_dir
    yield str(tmp_path / "xla")
    jax.config.update("jax_compilation_cache_dir", old)


def test_cache_dir_is_host_namespaced(fresh_cache_state):
    base = fresh_cache_state
    got = profiling.enable_compilation_cache(base)
    assert got is not None and os.path.isdir(got)
    # A strict subdirectory of the requested base, never the base itself:
    # the leaf is the host fingerprint (12-hex sha1 of machine+cpu flags,
    # or a bare machine-name fallback).
    assert os.path.dirname(got) == base
    leaf = os.path.basename(got)
    assert re.fullmatch(r"[0-9a-f]{12}", leaf) or re.fullmatch(r"[\w.-]+", leaf), leaf
    import jax

    assert jax.config.jax_compilation_cache_dir == got


def test_cache_enable_idempotent(fresh_cache_state):
    base = fresh_cache_state
    first = profiling.enable_compilation_cache(base)
    # Second call (even with a different base) returns the latched path
    # without touching jax config again.
    assert profiling.enable_compilation_cache("/nonexistent/other") == first


def test_cache_opt_out_env(fresh_cache_state, monkeypatch):
    monkeypatch.setenv("FASTSCNN_NO_COMPILATION_CACHE", "1")
    assert profiling.enable_compilation_cache(fresh_cache_state) is None


def test_same_host_same_fingerprint(fresh_cache_state, monkeypatch):
    base = fresh_cache_state
    first = profiling.enable_compilation_cache(base)
    monkeypatch.setattr(profiling, "_CACHE_ENABLED", [])
    second = profiling.enable_compilation_cache(base)
    assert first == second
