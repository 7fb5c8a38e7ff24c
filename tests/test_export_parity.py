"""Export artifacts + backend parity gate."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastscnn_tpu.engine import E2EConfig, InferenceEngine
from fastscnn_tpu.engine.export import export_stablehlo, load_exported
from fastscnn_tpu.models import FastSCNN, init_fast_scnn
from fastscnn_tpu.tools.compare_backends import compare_backends
from tests.conftest import REFERENCE_ROOT, requires_reference, requires_torch


@pytest.fixture(scope="module")
def small_setup():
    model = FastSCNN(num_classes=2)
    params, state = init_fast_scnn(jax.random.PRNGKey(0), 2)
    return model, params, state


def test_stablehlo_roundtrip(small_setup, tmp_path):
    model, params, state = small_setup
    engine = InferenceEngine(model, params, state, config=E2EConfig(compute_dtype="float32"))
    shape = (1, 96, 160, 3)
    fn = engine.predict_fn(shape)
    path = str(tmp_path / "model.stablehlo")
    export_stablehlo(fn, [jax.ShapeDtypeStruct(shape, jnp.uint8)], path, metadata={"k": 1})
    loaded = load_exported(path)
    assert loaded.metadata["k"] == 1
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, shape, dtype=np.uint8)
    np.testing.assert_array_equal(np.asarray(loaded(x)), np.asarray(fn(x)))
    # InferSession duck-type
    out = loaded.infer([x])
    assert out[0].shape == (1, 96, 160)


def test_e2e_internal_resize_softmax(small_setup, tmp_path):
    """E2E config: 160×96 input → 192² internal → softmax back at input res
    (the reference's EndToEndFastSCNN shape contract)."""
    model, params, state = small_setup
    engine = InferenceEngine(
        model,
        params,
        state,
        config=E2EConfig(internal_size=(192, 192), softmax=True, compute_dtype="float32"),
    )
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (1, 96, 160, 3), dtype=np.uint8)
    probs = engine.predict(x)
    assert probs.shape == (1, 96, 160, 2)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-3)


def test_backend_parity_gate(small_setup, tmp_path):
    model, params, state = small_setup
    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, (2, 96, 160, 3), dtype=np.uint8)
    results = compare_backends(model, params, state, images)
    # bf16 vs f32 argmax disagreement must stay inside the reference's
    # published export tolerance even on worst-case random weights/inputs
    assert results["f32_vs_bf16"] < 0.005


def test_backend_parity_gate_onnx_artifact(small_setup, tmp_path):
    """The reference's gate compares its SHIPPED artifact (the E2E ONNX,
    reference:compare_pytorch_onnx.py:88-112); ours now does too — the
    self-contained emitted .onnx is a first-class backend in the tool."""
    import jax
    import jax.numpy as jnp

    from fastscnn_tpu.engine.onnx_native import emit_fastscnn_onnx
    from fastscnn_tpu.models.fast_scnn import fold_inference_params

    model, params, state = small_setup
    rng = np.random.default_rng(2)
    images = rng.integers(0, 256, (1, 96, 160, 3), dtype=np.uint8)
    folded = jax.tree.map(
        lambda a: np.asarray(a, np.float32),
        fold_inference_params(params, state, dtype=jnp.float32),
    )
    path = str(tmp_path / "m.onnx")
    emit_fastscnn_onnx(model, folded, (1, 3, 96, 160), path, output="mask")
    results = compare_backends(model, params, state, images, export_path=path)
    # f32 engine vs the ONNX artifact must be exact (same math, f32)
    assert results["f32_vs_onnx"] == 0.0


@requires_reference
@requires_torch
def test_parity_gate_vs_reference_torch(tmp_path):
    """The full cross-framework gate: same weights through our engines AND
    the reference PyTorch model."""
    import sys

    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from models.fast_scnn import FastSCNN as TorchFastSCNN
    finally:
        sys.path.remove(REFERENCE_ROOT)
    import torch

    from fastscnn_tpu.models import import_torch_state_dict

    torch.manual_seed(0)
    tmodel = TorchFastSCNN(2, aux=False)
    tmodel.eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
    params, state = import_torch_state_dict(tmodel.state_dict(), 2, aux=False)
    model = FastSCNN(num_classes=2)

    rng = np.random.default_rng(2)
    images = rng.integers(0, 256, (2, 96, 160, 3), dtype=np.uint8)
    results = compare_backends(model, params, state, images, torch_model=tmodel)
    assert results["f32_vs_torch"] < 0.005
    assert results["torch_vs_bf16"] < 0.005


def test_export_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from fastscnn_tpu.export_model import main

    path = main(
        [
            "--dataset", "custom",
            "--input-width", "160",
            "--input-height", "96",
            "--internal-size", "192",
            "--output", "exports/test.stablehlo",
        ]
    )
    assert os.path.exists(path)
    assert os.path.exists(path + ".json")
