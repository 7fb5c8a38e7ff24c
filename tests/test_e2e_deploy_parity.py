"""Deployment-graph parity vs the reference's actual E2E export wrapper.

Loads reference:export_onnx_fixed.py (torch-only paths; its onnx imports
are guarded), builds ``EndToEndFastSCNN`` around a reference backbone
with ``replace_pyramid_pooling`` applied — the exact graph the reference
ships to the Atlas NPU — and compares against our engine in ATC-compat
mode (ppm grids 1/2/4/8, align_corners=False PPM) on the deployment
resolution (640×360 in, 1024² internal, softmax out).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, requires_reference, requires_torch


@requires_reference
@requires_torch
def test_atc_deploy_graph_parity():
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from models.fast_scnn import FastSCNN as TorchFastSCNN

        spec = importlib.util.spec_from_file_location(
            "ref_export_fixed", os.path.join(REFERENCE_ROOT, "export_onnx_fixed.py")
        )
        ref_export = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_export)
    finally:
        sys.path.remove(REFERENCE_ROOT)

    torch.manual_seed(0)
    tmodel = TorchFastSCNN(2, aux=True)
    tmodel.eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
    sd = {k: v.clone() for k, v in tmodel.state_dict().items()}

    # The reference's deploy surgery + wrapper (no normalization: custom ds)
    tmodel = ref_export.replace_pyramid_pooling(tmodel)
    e2e = ref_export.EndToEndFastSCNN(
        tmodel, input_size=(640, 360), base_size=1024, mean=None, std=None, apply_softmax=True
    )
    e2e.eval()

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (1, 360, 640, 3), dtype=np.uint8)
    with torch.no_grad():
        t_probs = (
            e2e(torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).astype(np.float32)))
            .numpy()
            .transpose(0, 2, 3, 1)
        )

    # Ours: same weights, ATC-compat architecture, same E2E config
    from fastscnn_tpu.engine import E2EConfig, InferenceEngine
    from fastscnn_tpu.models import FastSCNN, import_torch_state_dict

    params, state = import_torch_state_dict(sd, 2, aux=True)
    model = FastSCNN(num_classes=2, aux=True, ppm_sizes=(1, 2, 4, 8), ppm_align_corners=False)
    engine = InferenceEngine(
        model,
        params,
        state,
        config=E2EConfig(
            internal_size=(1024, 1024), mean=None, std=None, softmax=True,
            compute_dtype="float32",
        ),
    )
    probs = np.asarray(engine.predict(img))

    assert probs.shape == t_probs.shape == (1, 360, 640, 2)
    # probability-level agreement and mask-level agreement inside the
    # reference's published deploy tolerance (0.38%)
    np.testing.assert_allclose(probs, t_probs, atol=2e-3)
    mask_mismatch = float((probs.argmax(-1) != t_probs.argmax(-1)).mean())
    assert mask_mismatch < 0.0038, mask_mismatch


@requires_reference
@requires_torch
def test_odd_resolution_forward_parity():
    """The Atlas native resolution (360×640, not divisible by 32) must run
    and match torch exactly — exercises all the odd-size conv/pool/resize
    edge paths."""
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from models.fast_scnn import FastSCNN as TorchFastSCNN
    finally:
        sys.path.remove(REFERENCE_ROOT)
    import jax.numpy as jnp

    from fastscnn_tpu.models import FastSCNN, import_torch_state_dict

    torch.manual_seed(1)
    tmodel = TorchFastSCNN(2, aux=False)
    tmodel.eval()
    params, state = import_torch_state_dict(tmodel.state_dict(), 2, aux=False)
    model = FastSCNN(num_classes=2)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 3, 360, 640), dtype=np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x))[0].numpy()
    ours, _ = model.apply(params, state, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours[0]), (0, 3, 1, 2)), t_out, rtol=1e-3, atol=5e-4
    )
