"""The strongest checkpoint-compat evidence available without real data:
train a model HERE, save it in the reference's .pth dialect, load that
checkpoint into the REFERENCE torch implementation, and verify both
frameworks produce the same masks and metrics on held-out images."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_ROOT, requires_reference, requires_torch


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train a 2-class model for a few epochs on a separable synthetic task."""
    root = tmp_path_factory.mktemp("ds")
    (root / "images").mkdir()
    (root / "masks").mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        img = rng.integers(0, 100, (64, 64, 3), dtype=np.uint8)
        img[32:, :, 1] = rng.integers(150, 255, (32, 64), dtype=np.uint8)  # green lower half
        mask = np.zeros((64, 64), np.uint8)
        mask[32:, :] = 255
        Image.fromarray(img).save(root / "images" / f"s{i}.jpg")
        Image.fromarray(mask).save(root / "masks" / f"s{i}.png")

    workdir = tmp_path_factory.mktemp("work")
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        import random

        random.seed(7)
        from fastscnn_tpu.train import Trainer, parse_args

        args = parse_args(
            [
                "--dataset", "custom",
                "--data-root", str(root),
                "--base-size", "64",
                "--crop-size", "48",
                "--epochs", "16",
                "--batch-size", "2",
                "--lr", "0.05",
                "--loss-type", "dice",
                "--aux",
                "--no-val",
                "--save-epoch", "100",
                "--print-interval", "100",
            ]
        )
        trainer = Trainer(args)
        trainer.train()
        ckpt = trainer.save_checkpoint()
        ckpt = os.path.abspath(ckpt)
    finally:
        os.chdir(cwd)
    return str(root), ckpt


@requires_reference
@requires_torch
def test_trained_checkpoint_loads_in_reference_torch(trained):
    root, ckpt = trained
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from models.fast_scnn import FastSCNN as TorchFastSCNN
    finally:
        sys.path.remove(REFERENCE_ROOT)

    # The reference's own load path: plain load_state_dict, strict.
    tmodel = TorchFastSCNN(2, aux=True)
    sd = torch.load(ckpt, weights_only=False)
    tmodel.load_state_dict(sd)  # must accept every key, strict=True
    tmodel.eval()

    # Our engine on the same weights.
    from fastscnn_tpu.engine import E2EConfig, InferenceEngine
    from fastscnn_tpu.models import FastSCNN
    from fastscnn_tpu.utils.checkpoint import load_pth_checkpoint

    params, state = load_pth_checkpoint(ckpt, 2, aux=True)
    model = FastSCNN(num_classes=2, aux=True)
    engine = InferenceEngine(
        model, params, state, config=E2EConfig(mean=None, std=None, compute_dtype="float32")
    )

    from fastscnn_tpu.utils.metric import SegmentationMetric

    ours_metric = SegmentationMetric(2)
    torch_metric = SegmentationMetric(2)
    mismatch_rates = []
    for i in range(4):
        img = np.asarray(Image.open(os.path.join(root, "images", f"s{i}.jpg")), np.uint8)
        gt = (np.asarray(Image.open(os.path.join(root, "masks", f"s{i}.png"))) > 128).astype(
            np.int32
        )
        ours = engine.predict(img)
        x = img.astype(np.float32) / 255.0
        with torch.no_grad():
            logits = tmodel(torch.from_numpy(np.transpose(x[None], (0, 3, 1, 2))))[0]
        theirs = logits.argmax(1).numpy()[0]
        mismatch_rates.append(float((ours != theirs).mean()))
        ours_metric.update(ours, gt)
        torch_metric.update(theirs, gt)

    # identical masks (f32 both sides) and hence identical metrics
    assert max(mismatch_rates) < 1e-3, mismatch_rates
    pa_o, miou_o = ours_metric.get()
    pa_t, miou_t = torch_metric.get()
    assert abs(pa_o - pa_t) < 1e-4
    assert abs(miou_o - miou_t) < 1e-4
    # and the model actually learned the task
    assert miou_o > 0.5, f"trained mIoU too low: {miou_o}"
