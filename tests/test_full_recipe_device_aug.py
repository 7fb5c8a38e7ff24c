"""Full-recipe convergence equivalence of --device-aug (opt-in).

test_device_aug.py gates the on-device augmentation chain at the pixel
level against PIL with injected parameters; this gate composes it into
the actual Cityscapes-recipe training loop: OUR trainer runs the scaled
19-class recipe (OHEM-CE + aux 0.4 + poly LR, crop 128 / base 160 —
the same calibrated fixture recipe as test_full_recipe_parity.py) twice
from ONE shared init — once with the default host/PIL augmentation and
once with ``--device-aug`` (the PSP chain as batched MXU sampling
matmuls inside the jitted step) — and requires both arms to converge to
the same quality. The host-aug arm is separately gated against the
reference's own Trainer in test_full_recipe_parity.py, so transitively
this shows the TPU-native input story trains to reference quality.

Opt-in (FASTSCNN_FULL_RECIPE_DEVAUG=1): two 1800-step CPU training runs.

Reference semantics composed here: reference:train.py:241-368 recipe
with reference:data_loader/cityscapes.py:115-150 augmentation.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

pytestmark = [
    pytest.mark.skipif(
        not os.environ.get("FASTSCNN_FULL_RECIPE_DEVAUG"),
        reason="device-aug full-recipe convergence gate is opt-in: set "
        "FASTSCNN_FULL_RECIPE_DEVAUG=1 (two 1800-step CPU training runs)",
    )
]

from tests.test_full_recipe_parity import (  # noqa: E402
    BASE_SIZE,
    BATCH_SIZE,
    CROP_SIZE,
    EPOCHS,
    LR,
    N_TRAIN,
    N_VAL,
)


def _eval_our(trainer):
    """Final-val pixAcc / per-class IoU via the jitted eval step."""
    import jax.numpy as jnp

    from fastscnn_tpu.data import DataLoader

    totals = None
    for images, targets in DataLoader(trainer.val_ds, batch_size=1, num_workers=0):
        _, stats = trainer.eval_step(
            trainer.state.params,
            trainer.state.model_state,
            jnp.asarray(images),
            jnp.asarray(targets),
        )
        stats = [np.asarray(s, np.int64) for s in stats]
        totals = stats if totals is None else [a + b for a, b in zip(totals, stats)]
    correct, labeled, inter, union = [np.asarray(t, np.float64) for t in totals]
    pixacc = float(correct / (np.spacing(1) + labeled))
    iou = inter / (np.spacing(1) + union)
    return pixacc, iou, union


def test_device_aug_full_recipe_convergence(tmp_path, monkeypatch):
    from fastscnn_tpu.tools.system_check import generate_dataset
    from fastscnn_tpu.train import Trainer, parse_args
    from fastscnn_tpu.utils.checkpoint import save_pth_checkpoint

    monkeypatch.chdir(tmp_path)
    data_root = str(tmp_path / "citys")
    generate_dataset(
        data_root, n_train=N_TRAIN, n_val=N_VAL,
        height=BASE_SIZE, width=2 * BASE_SIZE, seed=7,
    )

    common = [
        "--dataset", "citys", "--data-root", data_root,
        "--base-size", str(BASE_SIZE), "--crop-size", str(CROP_SIZE),
        "--batch-size", str(BATCH_SIZE), "--epochs", str(EPOCHS),
        "--lr", str(LR), "--loss-type", "ce", "--aux",
        "--no-fp16",
        "--val-epoch", "100000", "--save-epoch", "100000",
        "--num-workers", "2", "--print-interval", "10000",
    ]

    # arm A: host/PIL aug (the default, reference-parity-gated path)
    args_a = parse_args(common + ["--seed", "11",
                                  "--save-folder", str(tmp_path / "wa")])
    trainer_a = Trainer(args_a)
    init_pth = save_pth_checkpoint(
        trainer_a.state.params, trainer_a.state.model_state,
        str(tmp_path), dataset="citys", aux=True,
    )
    trainer_a.train()
    pix_a, iou_a, union_a = _eval_our(trainer_a)

    # arm B: --device-aug from the same init (different RNG stream — the
    # comparison is convergence quality, not trajectory)
    args_b = parse_args(common + ["--seed", "12", "--device-aug",
                                  "--resume", init_pth,
                                  "--save-folder", str(tmp_path / "wb")])
    trainer_b = Trainer(args_b)
    assert trainer_b.train_ds.mode == "device-aug"
    trainer_b.train()
    pix_b, iou_b, union_b = _eval_our(trainer_b)

    miou_a, miou_b = float(iou_a.mean()), float(iou_b.mean())
    present = (union_a > 0) & (union_b > 0)
    gaps = np.abs(iou_a - iou_b)[present]
    print(
        f"\ndevice-aug full-recipe gate: host-aug pixAcc {pix_a:.4f} "
        f"mIoU {miou_a:.4f} | device-aug pixAcc {pix_b:.4f} mIoU {miou_b:.4f} | "
        f"per-class median gap {np.median(gaps):.4f} max {gaps.max():.4f}"
    )
    assert miou_a > 0.5, f"host-aug arm failed to converge: {miou_a:.4f}"
    assert miou_b > 0.5, f"device-aug arm failed to converge: {miou_b:.4f}"
    # same gates as the cross-framework composed gate (calibrated there
    # by the reference's own seed-twin spread on this fixture scale)
    assert abs(miou_a - miou_b) < 0.1, (
        f"device-aug convergence gap {abs(miou_a - miou_b):.4f} "
        f"(host {miou_a:.4f}, device {miou_b:.4f})"
    )
    assert abs(pix_a - pix_b) < 0.05
    assert np.median(gaps) < 0.1
