"""Multi-chip serving: batch-sharded inference over the virtual mesh must
match single-device results exactly."""

import numpy as np

import jax

from fastscnn_tpu.engine import E2EConfig, InferenceEngine
from fastscnn_tpu.models import FastSCNN, init_fast_scnn
from fastscnn_tpu.parallel import make_mesh


def test_sharded_predict_matches_single_device(rng):
    model = FastSCNN(num_classes=3)
    params, state = init_fast_scnn(jax.random.PRNGKey(0), 3)
    images = rng.integers(0, 256, (8, 64, 96, 3)).astype(np.uint8)

    single = InferenceEngine(
        model, params, state, config=E2EConfig(compute_dtype="float32")
    )
    mesh = make_mesh(n_data=8)
    sharded = InferenceEngine(
        model, params, state, config=E2EConfig(compute_dtype="float32"), mesh=mesh
    )
    np.testing.assert_array_equal(sharded.predict(images), single.predict(images))
    # the sharded path actually places the batch across devices
    fn = sharded.predict_fn(images.shape)
    out = fn(images)
    assert len(out.sharding.device_set) == 8


def test_spatial_sharded_predict_matches_single_device(rng):
    """dp×sp serving: batch over 4 devices, image H over 2 (halo exchanges
    handled by XLA) must be numerically identical to single-device."""
    model = FastSCNN(num_classes=3)
    params, state = init_fast_scnn(jax.random.PRNGKey(0), 3)
    images = rng.integers(0, 256, (4, 64, 96, 3)).astype(np.uint8)

    single = InferenceEngine(model, params, state, config=E2EConfig(compute_dtype="float32"))
    mesh = make_mesh(n_data=4, n_space=2)
    sharded = InferenceEngine(
        model, params, state, config=E2EConfig(compute_dtype="float32"), mesh=mesh
    )
    np.testing.assert_array_equal(sharded.predict(images), single.predict(images))


def test_throughput_loop_body_contains_network():
    """The bench fori_loop must not be loop-invariant: XLA hoists an
    unchanged-x forward out of the while and the 'throughput' becomes
    iters scalar adds (observed 2026-08-16: doubling iters left total
    time unchanged, inflating fps ~iters x). Assert convolutions execute
    INSIDE the compiled while body (transitively through called
    computations)."""
    import re

    import jax.numpy as jnp

    model = FastSCNN(num_classes=5)
    params, state = init_fast_scnn(jax.random.PRNGKey(0), 5)
    eng = InferenceEngine(
        model, params, state, config=E2EConfig(compute_dtype="float32")
    )
    shape = (1, 64, 128, 3)
    fn = eng.throughput_fn(shape, iters=2)
    txt = fn.lower(jnp.zeros(shape, jnp.uint8)).compile().as_text()

    def computation_block(name):
        # block starts at a line beginning with the computation name and
        # runs to the first bare '}' line
        pat = re.compile(
            rf"^\s*{re.escape(name)} [^\n]*\{{\n(.*?)^\s*\}}", re.M | re.S
        )
        m = pat.search(txt)
        return m.group(1) if m else ""

    m = re.search(r"body=(%[\w.\-]+)", txt)
    assert m, "no while loop in compiled throughput program"
    seen, frontier, convs = set(), [m.group(1)], 0
    while frontier:
        name = frontier.pop()
        if name in seen:
            continue
        seen.add(name)
        block = computation_block(name)
        convs += len(re.findall(r"convolution", block))
        frontier.extend(re.findall(r"(?:calls|to_apply|body|condition)=(%[\w.\-]+)", block))
    assert convs >= 10, (
        f"only {convs} convolutions reachable from the while body — "
        "the forward pass was hoisted out of the benchmark loop"
    )
