"""Cross-framework TRAINING parity: our jitted train step vs the reference
PyTorch trainer, step-for-step from one shared initialization.

Round-1 parity only established one-forward logit agreement; these tests
close the accuracy axis by verifying the full training trajectory:

1. ``test_sgd_trajectory_matches_reference_inner_loop`` — 200 fp32 SGD
   steps through an exact reconstruction of the reference Trainer's inner
   loop (reference:train.py:253-306: per-iteration poly LR poke →
   forward → MixDiceLoss → backward → SGD(momentum .9, wd 1e-4) step),
   identical batches from the committed mini-lane fixture set, per-step
   loss tolerance + final-model mask/mIoU agreement.
2. ``test_reference_trainer_end_to_end_parity`` — drives the reference's
   ACTUAL ``Trainer`` class (reference:train.py:100-368) on the fixture
   dataset (registry monkeypatched), records every batch it consumed and
   every loss it produced, replays the same batches through our
   ``make_train_step`` from the same imported init, and requires the loss
   trajectory and final parameters to match.
3. ``test_convergence_to_lane_iou_gate`` — convergence smoke: our stack
   alone trains the fixture set to >0.9 lane IoU through the real eval
   step (the "trainable to quality" gate no single-step test provides).

Dropout is disabled on BOTH sides (torch ``p=0`` / our ``dropout_rate=0``):
dropout masks are framework-RNG-specific and cannot be equated; everything
else — conv/BN math, BN running-stat updates, loss, LR schedule, optimizer
update order — is exercised verbatim.

Tolerance design (measured, 2026-08-17): training through batch-stat BN +
ReLUs is chaotically sensitive — our own trainer, restarted from the same
init perturbed by 1e-7, diverges from itself to ~1e-2 per-step loss
difference by step 5 and ~3e-2 spikes by step 50 (the probe in this
file's history), which matches the observed torch-vs-ours divergence
exactly. Bitwise reduction-order noise (~1e-7) is the seed either way, so
per-step equality beyond the first few steps is impossible *by
construction*, for any two runs, even within one framework. Gradients at
the shared init are likewise ill-conditioned in f32: torch's OWN f32
gradients deviate from its f64 gradients by 3.5e-3 (max-abs, scale 0.91),
worst in the earliest layers — so cross-framework gradient agreement is
gated against torch's own f32↔f64 precision error, not against zero.
The gates therefore check (a) exact agreement where determinism holds —
loss at the shared init and the first steps, gradients within the f32
conditioning envelope — and (b) chaos-bounded trajectory tracking plus
final-quality equivalence beyond that.
"""

from __future__ import annotations

import copy
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastscnn_tpu.losses import get_loss_fn
from fastscnn_tpu.models import (
    FastSCNN,
    export_torch_state_dict,
    import_torch_state_dict,
)
from fastscnn_tpu.parallel.train import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from fastscnn_tpu.utils.lr_scheduler import lr_schedule
from tests.conftest import REFERENCE_ROOT, requires_reference, requires_torch
from tests.fixtures.gen_mini_lane import load as load_fixtures

BS = 4
LR = 1e-2
MOMENTUM = 0.9
WEIGHT_DECAY = 1e-4
AUX_WEIGHT = 0.4


def _ref_import(module: str):
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import importlib

        return importlib.import_module(module)
    finally:
        sys.path.remove(REFERENCE_ROOT)


def _torch_model_no_dropout(num_classes: int, aux: bool, seed: int = 0):
    """Reference FastSCNN with dropout disabled (see module docstring)."""
    import torch

    tmod = _ref_import("models.fast_scnn")
    torch.manual_seed(seed)
    model = tmod.FastSCNN(num_classes, aux=aux)
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    return model


def _batches(images: np.ndarray, masks: np.ndarray, steps: int, bs: int):
    """Deterministic batch sequence cycling the fixture set in order."""
    n = len(images)
    for k in range(steps):
        idx = [(k * bs + j) % n for j in range(bs)]
        yield images[idx], masks[idx].astype(np.int64)


def _our_setup(init_sd, steps_per_epoch: int, nepochs: int, compute_dtype=jnp.float32):
    model = FastSCNN(num_classes=2, aux=True, dropout_rate=0.0)
    params, state = import_torch_state_dict(init_sd, num_classes=2, aux=True)
    schedule = lr_schedule(
        "poly", base_lr=LR, nepochs=nepochs, iters_per_epoch=steps_per_epoch, power=0.9
    )
    optimizer = make_optimizer(
        "sgd", schedule=schedule, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY
    )
    loss_fn = get_loss_fn("dice", aux=True, aux_weight=AUX_WEIGHT)
    # mean=None/std=None: the reference custom dataset normalizes by /255
    # only (reference:data_loader/custom.py:160-164).
    step = make_train_step(
        model, loss_fn, optimizer, mesh=None, compute_dtype=compute_dtype,
        mean=None, std=None,
    )
    tstate = create_train_state(model, optimizer, params=params, model_state=state)
    return model, step, tstate


def _torch_poly_sgd_setup(model, steps_per_epoch: int, nepochs: int):
    """The reference Trainer's exact loss/optimizer/schedule construction
    (reference:train.py:183-207)."""
    import torch

    ref_loss = _ref_import("utils.loss")
    ref_sched = _ref_import("utils.lr_scheduler")
    criterion = ref_loss.MixDiceLoss(aux=True, aux_weight=AUX_WEIGHT)
    optimizer = torch.optim.SGD(
        model.parameters(), lr=LR, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY
    )
    scheduler = ref_sched.LRScheduler(
        mode="poly", base_lr=LR, nepochs=nepochs, iters_per_epoch=steps_per_epoch,
        power=0.9,
    )
    return criterion, optimizer, scheduler


def _eval_miou(model, params, state, images, masks):
    """Eval-mode lane IoU + mIoU + per-pixel predictions over the fixture set."""
    estep = make_eval_step(
        model, num_classes=2, compute_dtype=jnp.float32, mean=None, std=None
    )
    pred, (correct, labeled, inter, union) = estep(
        params, state, jnp.asarray(images), jnp.asarray(masks.astype(np.int32))
    )
    iou = np.asarray(inter, np.float64) / np.maximum(np.asarray(union, np.float64), 1)
    return np.asarray(pred), float(iou.mean()), iou


@requires_reference
@requires_torch
def test_sgd_trajectory_matches_reference_inner_loop():
    import torch

    steps, nepochs = 200, 40
    images, masks = load_fixtures()
    steps_per_epoch = len(images) // BS

    tmodel = _torch_model_no_dropout(2, aux=True)
    tmodel.train()
    init_sd = copy.deepcopy(tmodel.state_dict())
    criterion, topt, tsched = _torch_poly_sgd_setup(tmodel, steps_per_epoch, nepochs)

    model, step, tstate = _our_setup(init_sd, steps_per_epoch, nepochs)

    # --- gradient parity at the shared init (fully deterministic) ---------
    img0, tgt0 = next(_batches(images, masks, 1, BS))
    x0 = torch.from_numpy(img0.transpose(0, 3, 1, 2).astype(np.float32) / 255.0)
    topt.zero_grad()
    tloss0 = criterion(tmodel(x0), torch.from_numpy(tgt0))
    tloss0.backward()
    tgrads = {k: p.grad.detach().numpy().copy() for k, p in tmodel.named_parameters()}
    topt.zero_grad()

    # f64 reference gradient from the SAME torch model: early-layer
    # gradients of this net are ill-conditioned in f32 (training-mode BN
    # chains amplify rounding — measured: torch's own f32 grads deviate
    # from its f64 grads by 3.5e-3 max on a 0.91 scale, worst in
    # learning_to_downsample, decaying with depth). The cross-framework
    # gate below is calibrated against torch's own precision error.
    ref_loss = _ref_import("utils.loss")
    tmodel64 = _torch_model_no_dropout(2, aux=True)
    tmodel64.load_state_dict(init_sd)
    tmodel64 = tmodel64.double()
    tmodel64.train()
    crit64 = ref_loss.MixDiceLoss(aux=True, aux_weight=AUX_WEIGHT)
    x64 = torch.from_numpy(img0.transpose(0, 3, 1, 2).astype(np.float64) / 255.0)
    loss64 = crit64(tmodel64(x64), torch.from_numpy(tgt0))
    loss64.backward()
    tgrads64 = {
        k: p.grad.detach().numpy().astype(np.float64)
        for k, p in tmodel64.named_parameters()
    }

    loss_fn = get_loss_fn("dice", aux=True, aux_weight=AUX_WEIGHT)

    def loss_of(p):
        outputs, _ = model.apply(
            p, tstate.model_state, jnp.asarray(img0).astype(jnp.float32) / 255.0,
            training=True, rng=jax.random.PRNGKey(0), upsample_outputs=False,
        )
        return loss_fn(outputs, jnp.asarray(tgt0.astype(np.int32)))

    our_loss0, our_grads = jax.value_and_grad(loss_of)(tstate.params)
    assert abs(float(our_loss0) - float(tloss0.detach())) < 1e-5
    zeros_state = jax.tree_util.tree_map(lambda v: v * 0, tstate.model_state)
    gsd = export_torch_state_dict(our_grads, zeros_state)
    t_flat = np.concatenate([tgrads[k].ravel() for k in sorted(tgrads)])
    o_flat = np.concatenate([gsd[k].ravel() for k in sorted(tgrads)])
    t64_flat = np.concatenate([tgrads64[k].ravel() for k in sorted(tgrads)])
    # Self-calibrating gate: our f32 gradient must be as close to torch's
    # f32 gradient as torch's f32 gradient is to its own f64 truth (×3
    # slack for independent rounding directions). A wrong update rule or
    # loss/backward semantics lands orders of magnitude outside this.
    torch_precision_err = np.abs(t_flat - t64_flat).max()
    cross_err = np.abs(o_flat - t_flat).max()
    assert cross_err <= 3 * torch_precision_err + 1e-6, (
        f"gradient divergence {cross_err:.3e} exceeds 3× torch's own "
        f"f32↔f64 error {torch_precision_err:.3e}"
    )
    # And ours must be no farther from the f64 truth than torch-f32 is (×3).
    ours_vs_truth = np.abs(o_flat.astype(np.float64) - t64_flat).max()
    assert ours_vs_truth <= 3 * torch_precision_err + 1e-6, (
        f"our gradient {ours_vs_truth:.3e} from f64 truth vs torch-f32's "
        f"{torch_precision_err:.3e}"
    )
    cos = float(np.dot(o_flat, t_flat) / (np.linalg.norm(o_flat) * np.linalg.norm(t_flat)))
    # 1 - cos ≈ (conditioning noise / signal)² ≈ (3e-3)²; gate at 1e-4 to
    # catch gross direction errors without tripping on f32 conditioning.
    assert cos > 1 - 1e-4, f"gradient cosine {cos}"

    torch_losses, our_losses = [], []
    rng = jax.random.PRNGKey(0)
    for k, (img_u8, tgt) in enumerate(_batches(images, masks, steps, BS)):
        # --- reference inner loop (reference:train.py:257-280) ---
        cur_lr = tsched(k)
        for group in topt.param_groups:
            group["lr"] = cur_lr
        x_t = torch.from_numpy(
            (img_u8.transpose(0, 3, 1, 2).astype(np.float32)) / 255.0
        )
        y_t = torch.from_numpy(tgt)
        topt.zero_grad()
        outputs = tmodel(x_t)
        tloss = criterion(outputs, y_t)
        tloss.backward()
        topt.step()
        torch_losses.append(float(tloss.detach()))

        # --- our jitted step on the identical batch ---
        tstate, metrics = step(
            tstate, jnp.asarray(img_u8), jnp.asarray(tgt.astype(np.int32)), rng
        )
        our_losses.append(float(metrics["loss"]))

    torch_losses = np.asarray(torch_losses)
    our_losses = np.asarray(our_losses)
    diff = np.abs(torch_losses - our_losses)
    # Determinism holds for the first steps; beyond that the gates are the
    # measured chaos envelope (see module docstring): our own trainer
    # self-diverges to ~1e-2 by step 5 from a 1e-7 perturbation.
    assert diff[0] < 1e-5, f"step-0 loss diff {diff[0]:.2e}"
    assert diff[1] < 5e-3, f"step-1 divergence {diff[1]:.2e}"
    assert diff.max() < 0.15, f"trajectory broke tracking: max diff {diff.max():.3f}"
    smooth = np.convolve(diff, np.ones(21) / 21, mode="valid")
    assert smooth.max() < 0.06, f"smoothed divergence {smooth.max():.3f}"
    assert diff[-20:].mean() < 0.03, f"final divergence {diff[-20:].mean():.3f}"
    # Both must actually train, to the same level.
    assert torch_losses[-20:].mean() < 0.35 and our_losses[-20:].mean() < 0.35
    assert our_losses[-10:].mean() < our_losses[:10].mean() * 0.7

    # Final-model agreement: eval-mode predictions + mIoU within 0.1 point.
    tmodel.eval()
    with torch.no_grad():
        x_all = torch.from_numpy(
            images.transpose(0, 3, 1, 2).astype(np.float32) / 255.0
        )
        t_pred = tmodel(x_all)[0].argmax(1).numpy()
    our_pred, our_miou, _ = _eval_miou(
        model, tstate.params, tstate.model_state, images, masks
    )
    agreement = (our_pred == t_pred).mean()
    assert agreement > 0.97, f"final mask agreement {agreement:.5f}"

    # torch-side mIoU via the same histogram math.
    from fastscnn_tpu.utils.metric import seg_hist_update

    _, _, t_inter, t_union = seg_hist_update(
        jnp.asarray(t_pred.astype(np.int32)),
        jnp.asarray(masks.astype(np.int32)),
        2,
    )
    t_miou = float(
        (np.asarray(t_inter, np.float64) / np.maximum(np.asarray(t_union, np.float64), 1)).mean()
    )
    # Quality equivalence: two chaos-separated runs of the SAME math land
    # within 2 mIoU points on this set; a wrong update rule lands far away.
    assert abs(our_miou - t_miou) < 0.02, (
        f"mIoU diverged: ours {our_miou:.5f} vs torch {t_miou:.5f}"
    )
    assert our_miou > 0.8 and t_miou > 0.8


class _FixtureTorchDataset:
    """Minimal torch-compatible dataset standing in for the reference
    custom dataset (reference:data_loader/custom.py): /255 normalize only,
    deterministic per index (no augmentation — the parity subject is the
    training math, not the aug pipeline)."""

    num_class = 2
    NUM_CLASS = 2

    def __init__(self, images: np.ndarray, masks: np.ndarray):
        self.images, self.masks = images, masks

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        import torch

        x = torch.from_numpy(
            self.images[i].transpose(2, 0, 1).astype(np.float32) / 255.0
        )
        y = torch.from_numpy(self.masks[i].astype(np.int64))
        return x, y


@requires_reference
@requires_torch
def test_reference_trainer_end_to_end_parity(tmp_path, monkeypatch):
    import torch

    monkeypatch.setenv("MPLBACKEND", "Agg")
    monkeypatch.chdir(tmp_path)

    # torchvision is not installed in this environment; the reference
    # imports it only to build the dataset-side transforms
    # (reference:train.py:104-107), which never execute here because the
    # dataset registry is monkeypatched below. Stub just enough to import —
    # augmenting any bare stub another test module installed first
    # (tests/test_data.py registers an attribute-less one).
    class _UnusedTransform:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            raise RuntimeError("stub transform must never run")

    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    tr = getattr(tv, "transforms", None) or types.ModuleType("torchvision.transforms")
    for name in ("Compose", "ToTensor", "Normalize"):
        if not hasattr(tr, name):
            setattr(tr, name, _UnusedTransform)
    tv.transforms = tr
    monkeypatch.setitem(sys.modules, "torchvision", tv)
    monkeypatch.setitem(sys.modules, "torchvision.transforms", tr)

    train_mod = _ref_import("train")

    images, masks = load_fixtures()
    dataset = _FixtureTorchDataset(images, masks)
    monkeypatch.setattr(
        train_mod, "get_segmentation_dataset", lambda *a, **k: dataset
    )

    nepochs = 3
    args = types.SimpleNamespace(
        model="fast_scnn", dataset="custom", subset="100k", label_type="binary",
        sample_ratio=1.0, max_samples=None, keep_original_size=False,
        multi_scale=False, min_scale=0.8, max_scale=1.2, base_size=96,
        crop_size=64, train_split="train", aux=True, aux_weight=AUX_WEIGHT,
        epochs=nepochs, start_epoch=0, batch_size=BS, lr=LR, momentum=MOMENTUM,
        weight_decay=WEIGHT_DECAY, loss_type="dice", use_fp16=False,
        num_workers=0, resume=None, save_folder=str(tmp_path / "weights"),
        eval=False, no_val=True, val_interval=1, print_interval=10_000,
        device=torch.device("cpu"),
    )

    torch.manual_seed(123)
    trainer = train_mod.Trainer(args)
    inner = trainer.model
    for m in inner.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    init_sd = copy.deepcopy(inner.state_dict())

    consumed_images, consumed_targets, torch_losses = [], [], []

    class _RecModel(torch.nn.Module):
        def __init__(self, net):
            super().__init__()
            self.net = net

        def forward(self, x):
            consumed_images.append(x.detach().clone())
            return self.net(x)

    class _RecCriterion(torch.nn.Module):
        def __init__(self, crit):
            super().__init__()
            self.crit = crit

        def forward(self, outputs, targets):
            consumed_targets.append(targets.detach().clone())
            loss = self.crit(outputs, targets)
            torch_losses.append(float(loss.detach()))
            return loss

    trainer.model = _RecModel(inner)
    trainer.criterion = _RecCriterion(trainer.criterion)
    trainer.train()

    steps_per_epoch = len(trainer.train_loader)
    assert len(torch_losses) == nepochs * steps_per_epoch

    # Replay the exact batches the reference Trainer consumed. Its inputs
    # are u8/255 — invert losslessly back to uint8 for our step's on-device
    # normalization path.
    model, step, tstate = _our_setup(init_sd, steps_per_epoch, nepochs)
    rng = jax.random.PRNGKey(0)
    our_losses = []
    for x_t, y_t in zip(consumed_images, consumed_targets):
        u8 = np.rint(x_t.numpy().transpose(0, 2, 3, 1) * 255.0)
        assert np.abs(u8 - x_t.numpy().transpose(0, 2, 3, 1) * 255.0).max() < 1e-3
        tstate, metrics = step(
            tstate,
            jnp.asarray(u8.astype(np.uint8)),
            jnp.asarray(y_t.numpy().astype(np.int32)),
            rng,
        )
        our_losses.append(float(metrics["loss"]))

    diff = np.abs(np.asarray(torch_losses) - np.asarray(our_losses))
    # This test verifies the WIRING of the real Trainer (LR poke order,
    # optimizer construction, criterion selection, normalization, batch
    # flow); the first steps are deterministic, later ones chaos-bounded
    # (see module docstring). Long-horizon math parity is test 1's job.
    assert diff[0] < 1e-5, f"step-0 loss diff {diff[0]:.2e}"
    assert diff[1] < 5e-3, f"step-1 divergence {diff[1]:.2e}"
    assert diff.max() < 0.08, f"trainer-driven loss divergence {diff.max():.2e}"

    # Final parameters: chaos-bounded closeness after 18 steps, exact
    # structural match (every leaf present, correct shapes). BN running
    # stats are excluded from the closeness gate: at this tiny input the
    # PPM's 1×1-pooled layers average 4 values per batch stat, so their
    # EMAs inherit the full chaos separation (measured 0.6 relative) —
    # they are bounded here only structurally; their training-time effect
    # is covered by the loss-trajectory gates above and test 1's
    # 200-step final-mask gate.
    # BN affine parameters are likewise excluded from the tight gate: their
    # gradients are near-zero cancellation sums (loss nearly invariant —
    # the next normalization absorbs shifts), so like the running stats
    # they inherit full chaos separation relative to their tiny updates
    # (measured 1.4 relative on the 1×1-pooled PPM branch); they get a
    # loose absolute bound instead.
    ours_sd = export_torch_state_dict(tstate.params, tstate.model_state)
    theirs_sd = inner.state_dict()
    move_ours, move_theirs = [], []
    worst_key, worst = None, 0.0
    for k, v in ours_sd.items():
        tv = theirs_sd[k].detach().numpy()
        assert v.shape == tuple(tv.shape), f"shape drift at {k}"
        assert np.isfinite(v).all(), f"non-finite leaf {k}"
        if "running_" in k:
            continue
        iv = init_sd[k].detach().numpy()
        # a BN affine param has a sibling running_mean buffer
        is_bn_affine = k.rsplit(".", 1)[0] + ".running_mean" in theirs_sd
        if is_bn_affine:
            # near-invariant params (cancellation-noise gradients): bounded
            # absolutely, excluded from the relative gate and the
            # movement-direction statistic
            assert np.abs(v - tv).max() < 0.5, f"BN affine blow-up at {k}"
            continue
        move_ours.append((v - iv).ravel())
        move_theirs.append((tv - iv).ravel())
        err = np.max(np.abs(v - tv)) / (np.abs(tv).max() + 1e-6)
        if err > worst:
            worst_key, worst = k, float(err)
    # Same order of magnitude everywhere (wrong lr / loss-type / optimizer
    # wiring lands far outside this)...
    assert worst < 1.0, f"final param divergence {worst:.2e} at {worst_key}"
    # ...and the accumulated parameter MOVEMENT from the shared init must
    # correlate. Calibration: our own trainer vs itself with a 1e-7
    # perturbed init measures corr 0.40 at this 18-step horizon (chaos
    # floor); the cross-framework run measures 0.58. Matched wiring
    # cannot beat the chaos floor — the gate only excludes uncorrelated
    # or anti-correlated movement (wrong loss/sign/optimizer).
    mo = np.concatenate(move_ours)
    mt = np.concatenate(move_theirs)
    corr = float(np.dot(mo, mt) / (np.linalg.norm(mo) * np.linalg.norm(mt) + 1e-12))
    assert corr > 0.2, f"parameter-movement correlation {corr:.3f}"


def test_convergence_to_lane_iou_gate():
    """Convergence smoke on the fixture set: >0.9 lane IoU through the
    real train/eval steps (the quality gate behind BASELINE.md's mIoU
    north-star, scaled to the sandbox: no Cityscapes data is available)."""
    images, masks = load_fixtures()
    steps, nepochs = 500, 84
    steps_per_epoch = len(images) // BS

    model = FastSCNN(num_classes=2, aux=True, dropout_rate=0.0)
    params, state = model.init(jax.random.PRNGKey(3))
    schedule = lr_schedule(
        "poly", base_lr=LR, nepochs=nepochs, iters_per_epoch=steps_per_epoch, power=0.9
    )
    optimizer = make_optimizer("sgd", schedule=schedule)
    loss_fn = get_loss_fn("dice", aux=True, aux_weight=AUX_WEIGHT)
    step = make_train_step(
        model, loss_fn, optimizer, compute_dtype=jnp.float32, mean=None, std=None
    )
    tstate = create_train_state(model, optimizer, params=params, model_state=state)

    rng = jax.random.PRNGKey(0)
    for k, (img_u8, tgt) in enumerate(_batches(images, masks, steps, BS)):
        tstate, metrics = step(
            tstate, jnp.asarray(img_u8), jnp.asarray(tgt.astype(np.int32)), rng
        )
    _, miou, iou = _eval_miou(model, tstate.params, tstate.model_state, images, masks)
    assert iou[1] > 0.9, f"lane IoU {iou[1]:.4f} (mIoU {miou:.4f}) below gate"


@requires_reference
@requires_torch
def test_ohem_ce_trajectory_matches_reference_inner_loop(monkeypatch):
    """The Cityscapes-recipe loss (Mix OHEM-CE, reference:train.py:190-192)
    through the same 150-step trajectory gate as the dice test: the OHEM
    mining's discrete kept-set selection composes with our fused CE map
    (losses/segmentation.py::ohem_cross_entropy_loss) inside the jitted
    step exactly as the reference's numpy miner + CrossEntropyLoss does in
    its trainer loop. use_weight=False on both sides (the 19-entry
    Cityscapes weight table does not apply to the 2-class fixtures;
    weighted CE semantics are pinned separately in test_losses.py)."""
    import torch

    # The reference loss hard-codes .cuda() on the mined target
    # (reference:utils/loss.py:182); run it on CPU unchanged.
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False)

    steps, nepochs = 150, 30
    images, masks = load_fixtures()
    steps_per_epoch = len(images) // BS

    tmodel = _torch_model_no_dropout(2, aux=True)
    tmodel.train()
    init_sd = copy.deepcopy(tmodel.state_dict())
    ref_loss = _ref_import("utils.loss")
    criterion = ref_loss.MixSoftmaxCrossEntropyOHEMLoss(
        aux=True, aux_weight=AUX_WEIGHT, ignore_index=-1, use_weight=False
    )
    _, topt, tsched = _torch_poly_sgd_setup(tmodel, steps_per_epoch, nepochs)

    model = FastSCNN(num_classes=2, aux=True, dropout_rate=0.0)
    params, state = import_torch_state_dict(init_sd, num_classes=2, aux=True)
    schedule = lr_schedule(
        "poly", base_lr=LR, nepochs=nepochs, iters_per_epoch=steps_per_epoch, power=0.9
    )
    optimizer = make_optimizer(
        "sgd", schedule=schedule, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY
    )
    loss_fn = get_loss_fn("ce", aux=True, aux_weight=AUX_WEIGHT, num_classes=2)
    step = make_train_step(
        model, loss_fn, optimizer, mesh=None, compute_dtype=jnp.float32,
        mean=None, std=None,
    )
    tstate = create_train_state(model, optimizer, params=params, model_state=state)

    torch_losses, our_losses = [], []
    rng = jax.random.PRNGKey(0)
    for k, (img_u8, tgt) in enumerate(_batches(images, masks, steps, BS)):
        cur_lr = tsched(k)
        for group in topt.param_groups:
            group["lr"] = cur_lr
        x_t = torch.from_numpy(img_u8.transpose(0, 3, 1, 2).astype(np.float32) / 255.0)
        topt.zero_grad()
        tloss = criterion(tmodel(x_t), torch.from_numpy(tgt))
        tloss.backward()
        topt.step()
        torch_losses.append(float(tloss.detach()))

        tstate, metrics = step(
            tstate, jnp.asarray(img_u8), jnp.asarray(tgt.astype(np.int32)), rng
        )
        our_losses.append(float(metrics["loss"]))

    torch_losses = np.asarray(torch_losses)
    our_losses = np.asarray(our_losses)
    diff = np.abs(torch_losses - our_losses)
    # Same chaos-envelope structure as the dice trajectory gates, with the
    # transient bounds calibrated to OHEM: the discrete kept-set selection
    # amplifies reduction-order noise into mid-run excursions whose size
    # varies RUN TO RUN (torch's threaded CPU reductions are themselves
    # nondeterministic — observed max-diff 0.365 / smoothed 0.07 on one
    # run and smoothed 0.141 on the next, each with step 0 exact to 6e-8
    # and the final 20 steps re-converged to ~3e-3). The transient gates
    # below are therefore loose sanity bounds; the discriminative
    # assertions are step-0 exactness, re-convergence, and final-model
    # agreement — a wrong loss/update breaks all three and never
    # re-converges.
    assert diff[0] < 1e-5, f"step-0 loss diff {diff[0]:.2e}"
    assert diff[1] < 5e-3, f"step-1 divergence {diff[1]:.2e}"
    assert diff.max() < 0.8, f"trajectory broke tracking: max diff {diff.max():.3f}"
    smooth = np.convolve(diff, np.ones(21) / 21, mode="valid")
    assert smooth.max() < 0.25, f"smoothed divergence {smooth.max():.3f}"
    assert diff[-20:].mean() < 0.05, f"no re-convergence: {diff[-20:].mean():.3f}"

    # Quality gates — NOT a loss-level gate: OHEM's reported loss is the
    # mean over the MINED (hardest) pixels, which hovers near ln 2 ≈ 0.74
    # on both frameworks BY CONSTRUCTION even as the models train to >99%
    # pixel accuracy (measured: torch 99.24% / ours 99.25% pixAcc,
    # agreement 99.2%, our mIoU 0.978 after these 150 steps).
    tmodel.eval()
    with torch.no_grad():
        x_all = torch.from_numpy(images.transpose(0, 3, 1, 2).astype(np.float32) / 255.0)
        t_pred = tmodel(x_all)[0].argmax(1).numpy()
    our_pred, our_miou, _ = _eval_miou(model, tstate.params, tstate.model_state, images, masks)
    assert (t_pred == masks).mean() > 0.97, "torch model failed to train under OHEM"
    assert (our_pred == masks).mean() > 0.97, "our model failed to train under OHEM"
    assert our_miou > 0.9, f"our final mIoU {our_miou:.3f}"
    agreement = (our_pred == t_pred).mean()
    assert agreement > 0.97, f"final mask agreement {agreement:.5f}"
