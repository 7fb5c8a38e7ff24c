"""Sharded training/eval step tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastscnn_tpu.losses import get_loss_fn
from fastscnn_tpu.models import FastSCNN
from fastscnn_tpu.parallel import (
    create_train_state,
    make_eval_step,
    make_mesh,
    make_optimizer,
    make_train_step,
)
from fastscnn_tpu.utils import lr_schedule


@pytest.fixture()
def setup():
    model = FastSCNN(num_classes=5, aux=True)
    schedule = lr_schedule("poly", base_lr=1e-2, niters=50, power=0.9)
    optimizer = make_optimizer("sgd", schedule)
    state = create_train_state(model, optimizer, key=jax.random.PRNGKey(0))
    return model, optimizer, state


def _batch(rng, n=8, h=64, w=64, c=5):
    images = rng.integers(0, 256, (n, h, w, 3)).astype(np.uint8)
    targets = rng.integers(-1, c, (n, h, w)).astype(np.int32)
    return jnp.asarray(images), jnp.asarray(targets)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_train_step_dp_mesh(setup, rng):
    model, optimizer, state = setup
    mesh = make_mesh(n_data=8)
    loss_fn = get_loss_fn("dice", aux=True)
    step = make_train_step(model, loss_fn, optimizer, mesh=mesh)
    images, targets = _batch(rng)
    targets = jnp.clip(targets, 0, 1)
    losses = []
    for i in range(3):
        state, metrics = step(state, images, targets, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3
    # dice on a learnable constant-ish problem should decrease
    assert losses[-1] <= losses[0] + 1e-3


def test_train_step_spatial_mesh(setup, rng):
    """dp×sp mesh: batch over 4 devices, H over 2 — halo exchanges for the
    convs are XLA's job; we assert numerical equivalence with 1-device."""
    model, optimizer, state = setup
    loss_fn = get_loss_fn("ce", aux=True, num_classes=5)
    images, targets = _batch(rng, n=4)

    # copy before the donating step consumes `state`'s buffers
    params_copy = jax.tree_util.tree_map(jnp.array, state.params)
    mstate_copy = jax.tree_util.tree_map(jnp.array, state.model_state)

    mesh2 = make_mesh(n_data=4, n_space=2)
    step2 = make_train_step(model, loss_fn, optimizer, mesh=mesh2, spatial_shard=True)
    s2, m2 = step2(state, images, targets, jax.random.PRNGKey(0))

    mesh1 = make_mesh(n_data=1, n_space=1, devices=jax.devices()[:1])
    state1 = create_train_state(model, optimizer, params=params_copy, model_state=mstate_copy)
    step1 = make_train_step(model, loss_fn, optimizer, mesh=mesh1)
    s1, m1 = step1(state1, images, targets, jax.random.PRNGKey(0))

    # bf16 forward: losses agree to bf16 tolerance (dropout rng identical).
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 2e-2


def test_eval_step_metric_psum(setup, rng):
    model, _, state = setup
    mesh = make_mesh(n_data=8)
    eval_step = make_eval_step(model, num_classes=5, mesh=mesh)
    images, targets = _batch(rng)
    pred, (correct, labeled, inter, union) = eval_step(
        state.params, state.model_state, images, targets
    )
    assert pred.shape == targets.shape
    assert int(labeled) == int(np.sum(np.asarray(targets) >= 0))
    assert (np.asarray(inter) <= np.asarray(union)).all()


def test_adamw_optimizer_path(setup, rng):
    model, _, _ = setup
    optimizer = make_optimizer("adamw", 1e-3)
    state = create_train_state(model, optimizer, key=jax.random.PRNGKey(1))
    loss_fn = get_loss_fn("dice", aux=True)
    step = make_train_step(model, loss_fn, optimizer)
    images, targets = _batch(rng, n=2, h=32, w=32)
    targets = jnp.clip(targets, 0, 1)
    state, metrics = step(state, images, targets, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = fn(*args)
    assert out.shape == (1, 1024, 2048)
