"""Auto-resume (preemption recovery) and multi-host helpers."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from fastscnn_tpu.parallel.multihost import host_shard, initialize_multihost, is_primary_host


@pytest.fixture
def tiny_ds(tmp_path):
    root = tmp_path / "ds"
    (root / "images").mkdir(parents=True)
    (root / "masks").mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        mask = np.zeros((48, 48), np.uint8)
        mask[24:] = 255
        Image.fromarray(img).save(root / "images" / f"s{i}.jpg")
        Image.fromarray(mask).save(root / "masks" / f"s{i}.png")
    return str(root)


def test_auto_resume_continues_from_step(tiny_ds, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from fastscnn_tpu.train import Trainer, parse_args

    flags = [
        "--dataset", "custom",
        "--data-root", tiny_ds,
        "--base-size", "48",
        "--crop-size", "32",
        "--epochs", "2",
        "--batch-size", "2",
        "--loss-type", "dice",
        "--no-val",
        "--save-epoch", "1",
        "--print-interval", "100",
    ]
    t1 = Trainer(parse_args(flags))
    t1.train()
    step_after = int(t1.state.step)
    assert step_after == 2 * t1.iters_per_epoch

    # simulate a preempted restart asking for more epochs
    args2 = parse_args(flags + ["--auto-resume", "--epochs", "3"])
    t2 = Trainer(args2)
    assert int(t2.state.step) == step_after
    assert args2.start_epoch == 2  # continues at epoch 2, not 0
    t2.train()
    assert int(t2.state.step) == 3 * t2.iters_per_epoch


def test_multihost_noop_single_process():
    assert initialize_multihost() is False  # no env vars → single host no-op
    assert is_primary_host()
    a = np.arange(8)
    b = np.arange(16).reshape(8, 2)
    ra = host_shard(a)
    np.testing.assert_array_equal(ra, a)
    ra, rb = host_shard(a, b)
    np.testing.assert_array_equal(rb, b)
