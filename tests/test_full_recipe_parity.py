"""North-star COMPOSED gate: the reference's full Cityscapes recipe run in
BOTH stacks to convergence, final quality compared through each stack's
own eval.

Round-2 verdict: every link of the training chain was gated separately
(aug pixel parity in tests/test_data.py, OHEM trajectory parity, poly-LR
and optimizer parity in tests/test_training_parity.py) but nothing ever
ran the reference's actual recipe SHAPE — 19 classes + random-scale/crop/
flip/blur augmentation (reference:data_loader/cityscapes.py:115-150) +
MixSoftmaxCrossEntropyOHEM with the Cityscapes class-weight table + aux
0.4 (reference:train.py:190-192) + poly LR + SGD(momentum .9, wd 1e-4)
(reference:train.py:196-209) — composed, to convergence. This test does,
on a seed-generated synthetic Cityscapes-format fixture set (the
system_check generator: real leftImg8bit/gtFine_labelIds tree → exercises
the 34→19 labelId remap in both loaders), scaled from crop 768/bs 16 to
crop 128/bs 8 for suite time as the round-2 verdict allows.

Protocol:
  1. generate the fixture tree (96 train / 12 val images, 160x320);
  2. build the reference's real ``Trainer`` (reference:train.py:100-368)
     with dataset='citys', loss_type='ce' (→ Mix OHEM-CE + class
     weights), aux, poly LR — aug pipeline ON, dropout ON — and train it
     to convergence on CPU (~900 steps);
  3. train OUR real ``Trainer`` (fastscnn_tpu/train.py) with the same
     recipe flags FROM THE SAME INITIAL WEIGHTS (the torch init exported
     to a .pth and loaded via --resume, exercising the checkpoint
     importer too), our own aug pipeline ON, seeded;
  4. evaluate each final model through ITS OWN eval stack (the
     reference's val-mode transform + SegmentationMetric vs our bucketed
     eval step + device histogram metric) and gate:
       - both converge (mIoU floor),
       - |mIoU_ours − mIoU_ref| < 0.1   (the north-star number),
       - pixAcc within 0.05,
       - per-class IoU agreement on classes present in the val set.

Randomness note: the two stacks see identical DATA but independent
shuffle/augmentation/dropout RNG streams — after ~900 steps the
comparison is between converged basins, not trajectories (trajectory
parity is tests/test_training_parity.py's job), which is exactly the
claim "a user switching frameworks reproduces the reference's accuracy
under the reference's recipe".

Opt-in (FASTSCNN_FULL_RECIPE=1): the two CPU training runs take ~10 min
total; the full suite stays fast without it. Executed results are
recorded in PARITY.md ("full-recipe composed convergence" row).
"""

from __future__ import annotations

import copy
import os
import sys
import types

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, requires_reference, requires_torch

pytestmark = [
    pytest.mark.skipif(
        not os.environ.get("FASTSCNN_FULL_RECIPE"),
        reason="full-recipe convergence gate is opt-in: set FASTSCNN_FULL_RECIPE=1 "
        "(two ~900-step CPU training runs, ~10 min)",
    )
]

# Scaled recipe (reference defaults in parentheses): crop 128 (768),
# base 160 (1024), bs 8 (16), ~1800 steps (~160 epochs x 186 steps).
# Calibration (first execution, 2026-08-19): at 900 steps both stacks
# converge globally (ref mIoU 0.756 / ours 0.783, pixAcc 0.952 both)
# but each leaves a DIFFERENT 4-5 rare classes untrained (per-class IoU
# diff bimodal at ~0.9) — underfit tails, not a parity defect; 1800
# steps trains the tails out on both sides.
BASE_SIZE = 160
CROP_SIZE = 128
BATCH_SIZE = 8
EPOCHS = 150  # x 12 steps/epoch = 1800 steps
LR = 1e-2
N_TRAIN, N_VAL = 96, 16


def _ref_import(module: str):
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import importlib

        return importlib.import_module(module)
    finally:
        sys.path.remove(REFERENCE_ROOT)


def _install_working_torchvision_stub(monkeypatch):
    """torchvision is absent in this env; the reference Trainer only uses
    transforms.{Compose,ToTensor,Normalize} (reference:train.py:104-107),
    which the citys dataset DOES execute per item — provide working
    implementations with standard torchvision semantics."""
    import torch

    class _Compose:
        def __init__(self, ts):
            self.ts = list(ts)

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class _ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, np.float32) / 255.0  # HWC in [0,1]
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    class _Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.Compose, tr.ToTensor, tr.Normalize = _Compose, _ToTensor, _Normalize
    tv.transforms = tr
    monkeypatch.setitem(sys.modules, "torchvision", tv)
    monkeypatch.setitem(sys.modules, "torchvision.transforms", tr)


def _per_class_iou_ref(metric):
    return np.asarray(metric.total_inter, np.float64) / (
        np.spacing(1) + np.asarray(metric.total_union, np.float64)
    )


@requires_reference
@requires_torch
def test_full_recipe_composed_convergence(tmp_path, monkeypatch):
    import torch

    from fastscnn_tpu.tools.system_check import generate_dataset

    monkeypatch.setenv("MPLBACKEND", "Agg")
    monkeypatch.chdir(tmp_path)
    # the reference OHEM loss hard-codes .cuda() on the mined target
    # (reference:utils/loss.py:180) — identity on this CPU-only box
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False)
    _install_working_torchvision_stub(monkeypatch)

    data_root = str(tmp_path / "citys")
    generate_dataset(
        data_root, n_train=N_TRAIN, n_val=N_VAL, height=BASE_SIZE, width=2 * BASE_SIZE, seed=7
    )

    # ---- reference stack: the real Trainer, real recipe ------------------
    train_mod = _ref_import("train")
    real_get = train_mod.get_segmentation_dataset
    monkeypatch.setattr(
        train_mod,
        "get_segmentation_dataset",
        lambda name, **kw: real_get(name, root=data_root, **kw),
    )
    args = types.SimpleNamespace(
        model="fast_scnn", dataset="citys", subset="100k", label_type="binary",
        sample_ratio=1.0, max_samples=None, keep_original_size=False,
        multi_scale=False, min_scale=0.8, max_scale=1.2,
        base_size=BASE_SIZE, crop_size=CROP_SIZE, train_split="train",
        aux=True, aux_weight=0.4, epochs=EPOCHS, start_epoch=0,
        batch_size=BATCH_SIZE, lr=LR, momentum=0.9, weight_decay=1e-4,
        loss_type="ce", use_fp16=False, num_workers=0, resume=None,
        save_folder=str(tmp_path / "ref_weights"), eval=False, no_val=True,
        val_interval=1, print_interval=10_000, device=torch.device("cpu"),
    )
    torch.manual_seed(123)
    trainer_ref = train_mod.Trainer(args)
    assert "OHEM" in type(trainer_ref.criterion).__name__  # the citys recipe
    init_sd = copy.deepcopy(trainer_ref.model.state_dict())
    init_pth = str(tmp_path / "shared_init.pth")
    torch.save(init_sd, init_pth)

    trainer_ref.train()

    # reference's own eval: val-mode transform + its SegmentationMetric
    ref_metric_mod = _ref_import("utils.metric")
    metric = ref_metric_mod.SegmentationMetric(19)
    trainer_ref.model.eval()
    with torch.no_grad():
        for img, mask in trainer_ref.val_loader:
            pred = trainer_ref.model(img.to(args.device))[0].argmax(1)
            metric.update(pred.numpy() + 1, mask.numpy() + 1)
    ref_pixacc, ref_miou = metric.get()
    ref_iou = _per_class_iou_ref(metric)

    # ---- our stack: our real Trainer, same recipe, same init -------------
    from fastscnn_tpu.train import Trainer as OurTrainer
    from fastscnn_tpu.train import parse_args

    our_args = parse_args(
        [
            "--dataset", "citys", "--data-root", data_root,
            "--base-size", str(BASE_SIZE), "--crop-size", str(CROP_SIZE),
            "--batch-size", str(BATCH_SIZE), "--epochs", str(EPOCHS),
            "--lr", str(LR), "--loss-type", "ce", "--aux",
            "--no-fp16",  # f32 like the CPU reference run
            "--val-epoch", "100000",  # validate once, at the end
            "--save-epoch", "100000",
            "--num-workers", "2", "--seed", "11",
            "--resume", init_pth,  # the shared torch init, via the importer
            "--save-folder", str(tmp_path / "our_weights"),
            "--print-interval", "10000",
        ]
    )
    trainer_ours = OurTrainer(our_args)
    trainer_ours.train()

    # our own eval: the jitted eval step + device histogram metric
    import jax.numpy as jnp

    totals = None
    from fastscnn_tpu.data import DataLoader

    for images, targets in DataLoader(trainer_ours.val_ds, batch_size=1, num_workers=0):
        _, stats = trainer_ours.eval_step(
            trainer_ours.state.params,
            trainer_ours.state.model_state,
            jnp.asarray(images),
            jnp.asarray(targets),
        )
        stats = [np.asarray(s, np.int64) for s in stats]
        totals = stats if totals is None else [a + b for a, b in zip(totals, stats)]
    correct, labeled, inter, union = [np.asarray(t, np.float64) for t in totals]
    our_pixacc = float(correct / (np.spacing(1) + labeled))
    our_iou = inter / (np.spacing(1) + union)
    our_miou = float(our_iou.mean())

    print(
        f"\nfull-recipe composed gate: ref pixAcc {ref_pixacc:.4f} mIoU {ref_miou:.4f} | "
        f"ours pixAcc {our_pixacc:.4f} mIoU {our_miou:.4f}"
    )
    present = (np.asarray(metric.total_union) > 0) & (union > 0)
    per_class_diff = np.abs(ref_iou - our_iou)[present]
    print(
        f"per-class IoU diff over {int(present.sum())} present classes: "
        f"mean {per_class_diff.mean():.4f} max {per_class_diff.max():.4f}"
    )

    # both stacks converged under the composed recipe
    assert ref_miou > 0.5, f"reference failed to converge: mIoU {ref_miou:.4f}"
    assert our_miou > 0.5, f"our stack failed to converge: mIoU {our_miou:.4f}"
    # the north-star gate
    assert abs(our_miou - ref_miou) < 0.1, (
        f"composed-recipe mIoU gap {abs(our_miou - ref_miou):.4f} "
        f"(ref {ref_miou:.4f}, ours {our_miou:.4f})"
    )
    assert abs(our_pixacc - ref_pixacc) < 0.05
    # per-class IoU agreement (classes present in the val set on both sides)
    assert per_class_diff.mean() < 0.1, f"per-class mean gap {per_class_diff.mean():.4f}"
    assert per_class_diff.max() < 0.3, f"per-class worst gap {per_class_diff.max():.4f}"
