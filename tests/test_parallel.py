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


def test_grad_accum_matches_manual_microbatching(setup):
    """grad_accum=2 must equal the hand-rolled reference: per-microbatch
    grads (model_state threaded sequentially, rng fold_in per microbatch),
    averaged, one optimizer update.

    Uses a LOCAL generator, not the session ``rng`` fixture: the shared
    stream's position depends on which tests ran before, and this test's
    noise-floor tolerances must see fixed data regardless of suite
    composition (a stream shift once handed it a draw where one leaf's
    update collapsed to ~1e-7, turning ulp noise into a ratio of 1.09)."""
    import optax

    model, optimizer, state = setup
    loss_fn = get_loss_fn("dice", aux=True)
    images, targets = _batch(np.random.default_rng(1234), n=4, h=32, w=32)
    targets = jnp.clip(targets, 0, 1)
    key = jax.random.PRNGKey(3)

    params_copy = jax.tree_util.tree_map(jnp.array, state.params)
    mstate_copy = jax.tree_util.tree_map(jnp.array, state.model_state)

    # f32 compute: the test checks grad-accum *semantics* (slicing, rng
    # folding, BN-state threading, averaging) — bf16's 0.4% rounding noise
    # under different XLA fusion orders would swamp an elementwise check.
    step = make_train_step(
        model, loss_fn, optimizer, grad_accum=2, compute_dtype=jnp.float32
    )
    new_state, metrics = step(state, images, targets, key)

    from fastscnn_tpu.engine.infer import IMAGENET_MEAN, IMAGENET_STD
    from fastscnn_tpu.parallel.train import _normalize

    # The reference is the hand-unrolled two-microbatch computation,
    # jitted as ONE program — same execution mode as the scan-based step,
    # so diffs are pure reassociation ulps, not eager-vs-fused conv
    # algorithm drift (measured at ~0.5% rel on cancellation-heavy
    # updates when the reference ran eagerly).
    @jax.jit
    def manual_ref(params, mstate, images, targets, key):
        def loss_of(p, ms, x, t, k):
            cast = jax.tree_util.tree_map(lambda q: q.astype(jnp.float32), p)
            outputs, new_ms = model.apply(
                cast, ms, x, training=True, rng=k, upsample_outputs=False
            )
            return loss_fn(outputs, t).astype(jnp.float32), new_ms

        x = _normalize(images, IMAGENET_MEAN, IMAGENET_STD, jnp.float32)
        grads_sum, loss_sum, ms = None, 0.0, mstate
        for i in range(2):
            (loss, ms), g = jax.value_and_grad(loss_of, has_aux=True)(
                params, ms, x[i * 2 : (i + 1) * 2],
                targets[i * 2 : (i + 1) * 2], jax.random.fold_in(key, i),
            )
            g = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), g)
            grads_sum = g if grads_sum is None else jax.tree_util.tree_map(
                jnp.add, grads_sum, g
            )
            loss_sum = loss_sum + loss
        grads = jax.tree_util.tree_map(lambda a: a / 2, grads_sum)
        opt_state = optimizer.init(params)
        updates, _ = optimizer.update(grads, opt_state, params)
        return loss_sum / 2, optax.apply_updates(params, updates), ms

    want_loss, want_params, want_ms = manual_ref(
        params_copy, mstate_copy, images, targets, key
    )

    # Comparison is per-leaf UPDATE-NORM relative error, not elementwise:
    # the scan-compiled step and the unrolled reference fuse reductions
    # differently, and isolated elements drift by up to ~2e-5 through
    # small-batch BN-backward cancellation — a noise floor that moves
    # whenever the loss graph changes. Norm-level noise RMS-averages out
    # (~1e-3 of the update norm), while any semantic error (wrong rng
    # fold / slice / missing ÷grad_accum / un-threaded BN state) shifts
    # the WHOLE update, giving ratios of O(0.3–1).
    np.testing.assert_allclose(
        float(metrics["loss"]), float(want_loss), rtol=1e-3, atol=1e-5
    )

    def assert_update_close(got, want, base, what):
        for g, w, b in zip(
            jax.tree_util.tree_leaves(got),
            jax.tree_util.tree_leaves(want),
            jax.tree_util.tree_leaves(base),
        ):
            g, w, b = (np.asarray(t, np.float64) for t in (g, w, b))
            err = np.linalg.norm((g - w).ravel())
            update = np.linalg.norm((w - b).ravel())
            # Two-sided gate: pass if the difference is within the f32
            # ulp noise floor for a leaf of this magnitude (~10 ulps:
            # 1e-6·||leaf||) OR within 5% of the update norm. A leaf
            # whose gradient happens to be ~0 for this draw has
            # update≈1e-7, where pure reassociation noise would
            # otherwise blow the ratio past any threshold; a semantic
            # bug (wrong rng fold / slice / missing ÷grad_accum /
            # un-threaded BN state) shifts the WHOLE update, clearing
            # both gates by orders of magnitude.
            noise_floor = 1e-6 * max(1.0, np.linalg.norm(b.ravel()))
            assert err < noise_floor or err < 0.05 * update, (
                f"{what}: ||got-want|| = {err:.3e}, update norm = "
                f"{update:.3e}, noise floor = {noise_floor:.3e}"
            )

    assert_update_close(new_state.params, want_params, params_copy, "params")
    # BN stats come from the threaded microbatch sequence
    assert_update_close(new_state.model_state, want_ms, mstate_copy, "bn state")


def test_grad_accum_on_dp_mesh(setup, rng):
    """grad_accum composes with the data mesh: microbatches stay
    batch-sharded, so the compiled program still contains gradient
    all-reduces (a traced-offset dynamic_slice formulation loses them —
    GSPMD all-gathers the inputs and replicates every microbatch)."""
    model, optimizer, state = setup
    mesh = make_mesh(n_data=2)
    loss_fn = get_loss_fn("dice", aux=True)
    step = make_train_step(model, loss_fn, optimizer, mesh=mesh, grad_accum=2)
    images, targets = _batch(rng, n=8, h=32, w=32)
    targets = jnp.clip(targets, 0, 1)

    compiled = step.lower(state, images, targets, jax.random.PRNGKey(0)).compile()
    hlo = compiled.as_text()
    assert "all-reduce" in hlo, "gradient psum over 'data' was compiled away"

    state, metrics = step(state, images, targets, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_grad_accum_rejects_bad_factor(setup):
    model, optimizer, _ = setup
    loss_fn = get_loss_fn("dice", aux=True)
    with pytest.raises(ValueError, match=">= 1"):
        make_train_step(model, loss_fn, optimizer, grad_accum=0)


def test_grad_accum_rejects_indivisible_batch(setup, rng):
    model, optimizer, state = setup
    loss_fn = get_loss_fn("dice", aux=True)
    step = make_train_step(model, loss_fn, optimizer, grad_accum=3)
    images, targets = _batch(rng, n=4, h=32, w=32)
    targets = jnp.clip(targets, 0, 1)
    with pytest.raises(ValueError, match="not divisible"):
        step(state, images, targets, jax.random.PRNGKey(0))


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = fn(*args)
    assert out.shape == (1, 1024, 2048)


def test_make_mesh_validates_divisibility():
    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(n_space=3)  # 8 virtual devices % 3 != 0
    with pytest.raises(ValueError, match="empty mesh"):
        make_mesh(n_data=0, n_space=2)


@pytest.mark.parametrize("impl", ["tapbwd", "taps", "pallas"])
def test_train_step_dp_mesh_stem_variants(setup, rng, impl):
    """Every stem_impl must compose with the sharded train step (custom
    VJPs + strided-slice formulations under GSPMD + grad-accum scan):
    one dp-mesh step, finite loss, and the same loss as stem_impl='xla'
    on the identical batch (f32 reassociation tolerance)."""
    _, optimizer, _ = setup
    mesh = make_mesh(n_data=8)
    loss_fn = get_loss_fn("ce", aux=True, num_classes=5)
    images, targets = _batch(rng)

    losses = {}
    for stem in ("xla", impl):
        model = FastSCNN(num_classes=5, aux=True, stem_impl=stem)
        state = create_train_state(model, optimizer, key=jax.random.PRNGKey(0))
        step = make_train_step(
            model, loss_fn, optimizer, mesh=mesh, compute_dtype=jnp.float32,
            grad_accum=2,
        )
        state, metrics = step(state, images, targets, jax.random.PRNGKey(0))
        losses[stem] = float(metrics["loss"])
        assert np.isfinite(losses[stem])
        assert int(state.step) == 1
    assert abs(losses["xla"] - losses[impl]) < 1e-5, losses


def test_raw_step_matches_jitted(setup, rng):
    """make_train_step(jit=False) returns the same traceable step the
    jitted builder wraps (bench_train embeds it in an on-device
    fori_loop): one step from one state must match the jitted result
    bitwise, including under grad-accum."""
    model, optimizer, state = setup
    loss_fn = get_loss_fn("dice", aux=True)
    images, targets = _batch(rng)
    targets = jnp.clip(targets, 0, 1)
    for ga in (1, 2):
        jitted = make_train_step(model, loss_fn, optimizer, grad_accum=ga)
        raw = make_train_step(model, loss_fn, optimizer, grad_accum=ga, jit=False)
        # the jitted builder donates argnum 0 (deletes the passed state's
        # buffers), so each call gets its own identical fresh state
        s2, m2 = jax.jit(raw)(
            create_train_state(model, optimizer, key=jax.random.PRNGKey(0)),
            images, targets, jax.random.PRNGKey(7))
        s1, m1 = jitted(
            create_train_state(model, optimizer, key=jax.random.PRNGKey(0)),
            images, targets, jax.random.PRNGKey(7))
        assert float(m1["loss"]) == float(m2["loss"])
        # zip() truncates silently — pin the tree structures first so a
        # restore/step that drops trailing leaves cannot pass vacuously.
        assert (jax.tree_util.tree_structure(s1.params)
                == jax.tree_util.tree_structure(s2.params))
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_raw_step_rejects_mesh(setup):
    model, optimizer, _ = setup
    loss_fn = get_loss_fn("dice", aux=True)
    with pytest.raises(ValueError, match="single-device"):
        make_train_step(model, loss_fn, optimizer, mesh=make_mesh(n_data=8), jit=False)
