"""Last-mile coverage: ATC-compat export CLI, system-check dataset format."""

import os

import numpy as np
import pytest


def test_export_cli_atc_compat(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from fastscnn_tpu.export_model import main

    path = main(
        [
            "--dataset", "custom",
            "--input-width", "160",
            "--input-height", "96",
            "--internal-size", "256",  # 1/32 map = 8×8, divisible by grids 1/2/4/8
            "--atc-compat",
            "--output", "exports/atc.stablehlo",
        ]
    )
    assert os.path.exists(path)
    import json

    meta = json.load(open(path + ".json"))
    assert meta["internal_size"] == 256


def test_system_check_dataset_is_valid_cityscapes_tree(tmp_path):
    """generate_dataset must produce a tree the real Cityscapes loader
    accepts, with only valid labelIds."""
    from fastscnn_tpu.data import get_segmentation_dataset
    from fastscnn_tpu.tools.system_check import generate_dataset

    root = generate_dataset(str(tmp_path / "citys"), n_train=3, n_val=2)
    ds = get_segmentation_dataset("citys", root=root, split="train", mode="testval")
    assert len(ds) == 3
    img, mask = ds[0]
    assert img.shape == (128, 256, 3)
    assert mask.min() >= -1 and mask.max() <= 18
    assert (mask == -1).any()  # ignore blobs present
    ds_val = get_segmentation_dataset("citys", root=root, split="val", mode="testval")
    assert len(ds_val) == 2


def test_atc_compat_model_differs_from_default():
    """The ATC-compat graph must actually change the pyramid pooling."""
    import jax
    import jax.numpy as jnp

    from fastscnn_tpu.models import FastSCNN, init_fast_scnn

    params, state = init_fast_scnn(jax.random.PRNGKey(0), 2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 256, 256, 3)).astype(np.float32))
    default = FastSCNN(num_classes=2)
    atc = FastSCNN(num_classes=2, ppm_sizes=(1, 2, 4, 8), ppm_align_corners=False)
    out_d, _ = default.apply(params, state, x)
    out_a, _ = atc.apply(params, state, x)
    assert not np.allclose(np.asarray(out_d[0]), np.asarray(out_a[0]), atol=1e-5)
