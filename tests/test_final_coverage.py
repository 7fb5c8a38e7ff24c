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


def test_atc_compat_changes_pyramid_pooling():
    """The ATC-compat knobs must actually change the PPM computation.

    Probed at the PPM directly with a spatially-varied feature map —
    full-network outputs at random init barely move because deep features
    are near-constant spatially (pooling-grid changes then vanish)."""
    import jax
    import jax.numpy as jnp

    from fastscnn_tpu.models import FastSCNN, init_fast_scnn

    params, state = init_fast_scnn(jax.random.PRNGKey(0), 2)
    ppm_p = params["global_feature_extractor"]["ppm"]
    ppm_s = state["global_feature_extractor"]["ppm"]
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((1, 8, 8, 128)).astype(np.float32))

    default = FastSCNN(num_classes=2)
    atc = FastSCNN(num_classes=2, ppm_sizes=(1, 2, 4, 8), ppm_align_corners=False)
    out_d, _ = default._ppm(ppm_p, ppm_s, feat, training=False)
    out_a, _ = atc._ppm(ppm_p, ppm_s, feat, training=False)
    diff = float(np.abs(np.asarray(out_d) - np.asarray(out_a)).max())
    assert diff > 1e-3, f"ATC PPM config had no effect (max diff {diff})"
