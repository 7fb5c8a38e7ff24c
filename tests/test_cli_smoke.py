"""Smoke tests for the thin CLIs not covered elsewhere: demo_tusimple,
validate_predictions, dataset_tools CLI, calibration CLI, per-class eval."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def custom_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("smoke_ds")
    (root / "images").mkdir()
    (root / "masks").mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)).save(
            root / "images" / f"s{i}.jpg"
        )
        mask = np.zeros((48, 64), np.uint8)
        mask[24:] = 255
        Image.fromarray(mask).save(root / "masks" / f"s{i}.png")
    return str(root)


def test_demo_tusimple_folder(custom_tree, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from fastscnn_tpu.demo_tusimple import main

    outs = main(
        [
            "--input", os.path.join(custom_tree, "images"),
            "--outdir", str(tmp_path / "out"),
            "--max-images", "2",
        ]
    )
    assert len(outs) == 2
    panel = Image.open(outs[0])
    assert panel.size == (64 * 2, 48)  # side-by-side


def test_validate_predictions_cli(custom_tree, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from fastscnn_tpu.tools.validate_predictions import main

    pa, miou = main(
        [
            "--dataset", "custom",
            "--data-root", custom_tree,
            "--base-size", "48",
            "--crop-size", "32",
            "--max-images", "2",
            "--outdir", str(tmp_path / "vr"),
        ]
    )
    assert 0.0 <= pa <= 1.0
    report = (tmp_path / "vr" / "validation_report.csv").read_text()
    assert "OVERALL" in report
    assert (tmp_path / "vr" / "val_0_panel.png").exists()


def test_dataset_tools_cli(custom_tree, tmp_path, capsys):
    from fastscnn_tpu.tools.dataset_tools import main

    main(["dedupe", "--dir", os.path.join(custom_tree, "images")])
    out = capsys.readouterr().out
    assert "duplicates" in out

    main(
        [
            "lane2drivable",
            "--input-dir", os.path.join(custom_tree, "masks"),
            "--output-dir", str(tmp_path / "drv"),
        ]
    )
    assert len(os.listdir(tmp_path / "drv")) == 4


def test_calibration_cli(tmp_path, capsys):
    from fastscnn_tpu.tools.calibration_tools import main

    out = tmp_path / "cal.json"
    main(
        [
            "from-points",
            "--points", "260,87", "378,87", "410,217", "231,221",
            "--out", str(out),
        ]
    )
    cal = json.loads(out.read_text())
    assert len(cal["transform_matrix"]) == 3


def test_eval_per_class_flag(custom_tree, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    from fastscnn_tpu.eval import main

    main(
        [
            "--dataset", "custom",
            "--data-root", custom_tree,
            "--mode", "val",
            "--base-size", "48",
            "--crop-size", "32",
            "--per-class",
            "--outdir", str(tmp_path / "tr"),
        ]
    )
    out = capsys.readouterr().out
    assert "class_0" in out and "class_1" in out
    assert "FINAL pixAcc" in out


def test_train_presets_dispatch(monkeypatch):
    """Preset flag plumbing without actually training."""
    import fastscnn_tpu.train_presets as tp

    captured = {}

    def fake_train_main(argv):
        captured["argv"] = argv

    monkeypatch.setattr("fastscnn_tpu.train.main", fake_train_main)
    tp.main(["tusimple", "--epochs", "1"])
    argv = captured["argv"]
    assert "--dataset" in argv and "tusimple" in argv
    # user flag comes after preset so it overrides
    assert argv.index("--epochs") < len(argv) - 1
    assert argv[-1] == "1"

    with pytest.raises(SystemExit):
        tp.main(["nonexistent"])
