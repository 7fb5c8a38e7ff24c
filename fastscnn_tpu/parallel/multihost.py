"""Multi-host (multi-slice) training support.

The reference has no multi-process story at all (SURVEY §2.9:
"add distributed training" is an unchecked TODO). The TPU-native path:
every host runs the same program, ``jax.distributed.initialize`` wires
the processes into one JAX runtime, and the existing mesh/sharding code
spans all chips — gradient psums ride ICI within a slice and DCN across
slices, inserted by XLA exactly as in the single-host case.

Usage (identical script on every host)::

    from fastscnn_tpu.parallel.multihost import initialize_multihost, host_shard
    initialize_multihost()                      # no-op on single host
    mesh = make_mesh()                          # now spans all processes
    for images, targets in loader:
        images, targets = host_shard(images, targets)   # this host's slice
        state, metrics = train_step(state, images, targets, key)

Data sharding convention: each host loads the FULL global batch index
list deterministically (same seed) and keeps only its
``process_index``-th slice — no inter-host data exchange needed.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["initialize_multihost", "host_shard", "is_primary_host", "global_device_count"]


def initialize_multihost(coordinator_address: str | None = None, num_processes: int | None = None,
                         process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or TPU metadata on
    Cloud TPU). Returns True if multi-host was initialized; a no-op
    single-host run returns False."""
    import jax

    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("PROCESS_ID")
    if coordinator_address is None and num_processes is None:
        # On Cloud TPU pods jax.distributed.initialize() autodetects; only
        # attempt when it looks like a pod environment.
        if os.environ.get("TPU_WORKER_HOSTNAMES") and "," in os.environ.get(
            "TPU_WORKER_HOSTNAMES", ""
        ):
            jax.distributed.initialize()
            return True
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _int_env(name):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def is_primary_host() -> bool:
    import jax

    return jax.process_index() == 0


def global_device_count() -> int:
    import jax

    return jax.device_count()


def host_shard(*arrays: np.ndarray):
    """Slice a globally-indexed batch down to this host's portion
    (batch axis 0 split evenly across processes)."""
    import jax

    n = jax.process_count()
    if n == 1:
        return arrays if len(arrays) > 1 else arrays[0]
    i = jax.process_index()
    out = []
    for a in arrays:
        per = a.shape[0] // n
        out.append(a[i * per : (i + 1) * per])
    return tuple(out) if len(out) > 1 else out[0]
