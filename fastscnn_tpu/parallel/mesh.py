"""Device-mesh construction and sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
over 2-3 GPUs (reference:train.py:170-171, SURVEY §2.9). The TPU-native
replacement: a ``jax.sharding.Mesh`` over ICI with

- ``data``  axis: batch-sharded data parallelism (gradient psum inserted
  by XLA; batch-norm moments reduce globally → free sync-BN, an upgrade
  over DataParallel's per-replica BN), and
- ``space`` axis (optional): spatial partitioning of the image H axis for
  very large inputs — XLA SPMD inserts halo exchanges for the convs
  (SURVEY §5.7's extension axis).

Multi-host extension: call ``jax.distributed.initialize()`` before mesh
creation and the same code spans slices over DCN.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "make_mesh_for_batch", "batch_sharding", "replicate_sharding", "P"]


def make_mesh(n_data: int | None = None, n_space: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'space') mesh; defaults to all devices on 'data'."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        if len(devices) % n_space:
            raise ValueError(
                f"{len(devices)} devices not divisible by n_space={n_space}"
            )
        n_data = len(devices) // n_space
    if n_data * n_space == 0:
        raise ValueError(f"empty mesh: n_data={n_data}, n_space={n_space}")
    if n_data * n_space > len(devices):
        raise ValueError(
            f"mesh needs {n_data * n_space} devices, only {len(devices)} visible"
        )
    if n_data * n_space < len(devices):
        # explicit subset is fine when the caller passed n_data, but say so
        import warnings

        warnings.warn(
            f"mesh uses {n_data * n_space} of {len(devices)} visible devices",
            stacklevel=2,
        )
    devs = np.asarray(devices[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(devs, ("data", "space"))


def make_mesh_for_batch(batch_size: int, devices=None) -> Mesh:
    """Data-parallel mesh using the most devices that evenly divide the
    global batch (a 2-image batch on an 8-device host uses 2 devices)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(n_data=n, devices=devices[:n])


def batch_sharding(mesh: Mesh, spatial_axis: int | None = None) -> NamedSharding:
    """NHWC batch sharded over 'data'; optionally H over 'space'."""
    spec = [None, None, None, None]
    spec[0] = "data"
    if spatial_axis is not None and mesh.shape["space"] > 1:
        spec[spatial_axis] = "space"
    return NamedSharding(mesh, P(*spec))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
