"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first jax import anywhere in the test
process; pytest imports conftest before collecting test modules, so this
is the single choke point.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The sandbox's sitecustomize registers the TPU plugin and pins
# JAX_PLATFORMS before user code runs; the config update below (post-import,
# pre-backend-init) is what actually forces CPU for the test suite.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng(request):
    """Per-test deterministic generator, seeded from the test's node id:
    a test's data must never depend on which other tests ran before it.
    (The previous session-scoped shared stream meant adding a test in one
    file shifted every later test's draws — which once turned a suite
    addition into a noise-floor tolerance flake three files away.)"""
    import zlib

    return np.random.default_rng(zlib.crc32(request.node.nodeid.encode()))


REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def has_torch() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except Exception:
        return False


requires_torch = pytest.mark.skipif(not has_torch(), reason="torch not installed")
