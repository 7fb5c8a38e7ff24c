"""Real multi-process distributed smoke run (SURVEY §5.8).

Round-2 verdict: ``jax.distributed.initialize`` had only ever been
called against a mock recorder — the first real execution of the
multi-process path must not be on a pod. This tool IS that real
execution, runnable on one machine: N local processes join a
127.0.0.1 coordinator over the CPU backend (each contributing
``--xla_force_host_platform_device_count`` virtual devices), build ONE
global data-parallel mesh spanning all processes, and run the actual
sharded train step (``parallel.train.make_train_step``) for a few steps
on deterministic synthetic data — every process computing the same
global batch and keeping its ``host_shard`` slice, exactly the
multi-host data convention ``parallel/multihost.py`` documents.

Each process writes a JSON result (loss history + a param fingerprint);
``tests/test_resume_multihost.py::test_real_two_process_distributed``
launches 2 processes + a single-process control with the same global
mesh size and asserts:
  - both processes see jax.process_count()==2 and the full global mesh,
  - loss histories agree bitwise across the two processes (they are the
    same replicated global computation), and
  - loss/params match the single-process control (same global batch,
    same 4-device mesh) to reduction-order tolerance.

Usage (what the test runs, one line per process)::

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=2 \
      python -m fastscnn_tpu.tools.multihost_smoke \
        --coordinator 127.0.0.1:<port> --num-processes 2 --process-id <k> \
        --steps 4 --out /tmp/proc<k>.json

The reference has no distributed training at all (its multi-GPU story
is a hard-coded 3-GPU DataParallel, reference:train.py:171-172); this
is the TPU-native replacement: one program, one mesh, XLA collectives.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _to_global(tree, sharding):
    """Promote host-local (replicated-value) pytree leaves to global
    jax.Arrays on a multi-process mesh."""
    import jax

    return jax.tree_util.tree_map(
        lambda leaf: jax.make_array_from_process_local_data(
            sharding, np.asarray(leaf)
        ),
        tree,
    )


def run(num_processes: int, process_id: int, coordinator: str | None,
        steps: int = 4, batch: int = 8, size: int = 32, out: str | None = None,
        platform: str | None = None):
    import jax

    if platform:
        # Env JAX_PLATFORMS is not enough here: this sandbox's
        # sitecustomize pins it to the TPU relay before user code runs —
        # the post-import, pre-backend-init config update is what sticks
        # (same trick as tests/conftest.py).
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fastscnn_tpu.models import FastSCNN
    from fastscnn_tpu.parallel import create_train_state, make_mesh, make_optimizer, make_train_step
    from fastscnn_tpu.parallel.multihost import host_shard, initialize_multihost
    from fastscnn_tpu.losses import get_loss_fn
    from fastscnn_tpu.utils import lr_schedule

    if num_processes > 1:
        assert initialize_multihost(coordinator, num_processes, process_id)
        assert jax.process_count() == num_processes, jax.process_count()

    mesh = make_mesh()  # all global devices on 'data'
    n_dev = jax.device_count()
    print(
        f"[proc {process_id}] joined: process_count={jax.process_count()} "
        f"global_devices={n_dev} mesh={dict(mesh.shape)}",
        flush=True,
    )

    model = FastSCNN(num_classes=2, aux=True, dropout_rate=0.0)
    schedule = lr_schedule("poly", base_lr=1e-2, niters=100, power=0.9)
    optimizer = make_optimizer("sgd", schedule, momentum=0.9, weight_decay=1e-4)
    step_fn = make_train_step(
        model, get_loss_fn("dice", aux=True), optimizer, mesh=mesh,
        mean=None, std=None, compute_dtype=jnp.float32,
    )

    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data", None, None, None))
    tgt_sh = NamedSharding(mesh, P("data", None, None))

    state = _to_global(
        create_train_state(model, optimizer, key=jax.random.PRNGKey(0)), repl
    )
    key = _to_global(jax.random.PRNGKey(42), repl)

    losses = []
    for k in range(steps):
        # every process derives the same GLOBAL batch, keeps its slice
        rng = np.random.default_rng(1000 + k)
        g_img = rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
        g_tgt = (rng.random((batch, size, size)) > 0.5).astype(np.int32)
        l_img, l_tgt = host_shard(g_img, g_tgt)
        images = jax.make_array_from_process_local_data(data_sh, l_img)
        targets = jax.make_array_from_process_local_data(tgt_sh, l_tgt)
        state, metrics = step_fn(state, images, targets, key)
        losses.append(float(metrics["loss"]))
        print(f"[proc {process_id}] step {k}: loss {losses[-1]:.6f}", flush=True)

    fingerprint = float(
        sum(float(jnp.sum(jnp.abs(leaf))) for leaf in jax.tree_util.tree_leaves(state.params))
    )
    result = {
        "process_id": process_id,
        "process_count": jax.process_count(),
        "device_count": n_dev,
        "mesh_shape": dict(mesh.shape),
        "losses": losses,
        "param_fingerprint": fingerprint,
        "final_step": int(state.step),
    }
    if out:
        with open(out, "w") as f:
            json.dump(result, f)
    print(json.dumps(result))
    return result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--coordinator", default=None, help="host:port of process 0")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=32)
    p.add_argument("--out", default=None, help="write the result JSON here")
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. 'cpu') before backend init")
    a = p.parse_args(argv)
    run(a.num_processes, a.process_id, a.coordinator, a.steps, a.batch, a.size, a.out,
        platform=a.platform)


if __name__ == "__main__":
    main()
