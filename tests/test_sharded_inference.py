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
