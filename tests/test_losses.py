"""Loss parity vs the reference implementations (torch/numpy on CPU)."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from fastscnn_tpu.losses import (
    CITYSCAPES_CLASS_WEIGHTS,
    cross_entropy_loss,
    dice_loss,
    focal_dice_loss,
    get_loss_fn,
    mix_cross_entropy_loss,
    mix_dice_loss,
    ohem_cross_entropy_loss,
)
from tests.conftest import REFERENCE_ROOT, requires_reference, requires_torch


def _ref_losses():
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import importlib

        mod = importlib.import_module("utils.loss")
    finally:
        sys.path.remove(REFERENCE_ROOT)
    return mod


def _rand_logits_target(rng, n=2, h=17, w=23, c=19, ignore_frac=0.2):
    logits = rng.standard_normal((n, h, w, c), dtype=np.float32) * 2
    target = rng.integers(0, c, size=(n, h, w)).astype(np.int64)
    ignore = rng.random((n, h, w)) < ignore_frac
    target[ignore] = -1
    return logits, target


@requires_reference
@requires_torch
def test_dice_loss_parity(rng):
    import torch

    ref = _ref_losses()
    logits, _ = _rand_logits_target(rng, c=2, ignore_frac=0.0)
    target = (rng.random((2, 17, 23)) < 0.3).astype(np.int64)
    ours = float(dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    theirs = float(
        ref.DiceLoss()(torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))), torch.from_numpy(target))
    )
    assert abs(ours - theirs) < 1e-6


@requires_reference
@requires_torch
def test_mix_dice_and_focal_dice_parity(rng):
    import torch

    ref = _ref_losses()
    logits, _ = _rand_logits_target(rng, c=2, ignore_frac=0.0)
    aux, _ = _rand_logits_target(rng, c=2, ignore_frac=0.0)
    target = (rng.random((2, 17, 23)) < 0.3).astype(np.int64)
    tl = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    ta = torch.from_numpy(np.transpose(aux, (0, 3, 1, 2)))
    tt = torch.from_numpy(target)

    ours = float(mix_dice_loss((jnp.asarray(logits), jnp.asarray(aux)), jnp.asarray(target)))
    theirs = float(ref.MixDiceLoss(aux=True)((tl, ta), tt))
    assert abs(ours - theirs) < 1e-6

    ours_fd = float(focal_dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    theirs_fd = float(ref.FocalDiceLoss()(tl, tt))
    assert abs(ours_fd - theirs_fd) < 1e-5


@requires_torch
def test_weighted_ce_matches_torch(rng):
    import torch

    logits, target = _rand_logits_target(rng)
    w = np.asarray(CITYSCAPES_CLASS_WEIGHTS, np.float32)
    ours = float(
        cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target), class_weights=w)
    )
    theirs = float(
        torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w), ignore_index=-1)(
            torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))), torch.from_numpy(target)
        )
    )
    assert abs(ours - theirs) < 1e-5


@requires_reference
@requires_torch
@pytest.mark.parametrize("min_kept", [16, 256, 100000])
def test_ohem_parity_with_reference_numpy_miner(rng, min_kept, monkeypatch):
    """Full OHEM parity: our on-device top-k mining must produce the same
    loss as the reference's CPU/numpy miner for min_kept both below and
    above the number of valid pixels."""
    import torch

    ref = _ref_losses()
    logits, target = _rand_logits_target(rng, n=1, h=13, w=19, c=19)

    # The reference hard-codes .cuda(); run its numpy mining by hand instead.
    crit = ref.SoftmaxCrossEntropyOHEMLoss.__new__(ref.SoftmaxCrossEntropyOHEMLoss)
    thresh = 0.7
    c = 19
    x = np.rollaxis(np.transpose(logits, (0, 3, 1, 2)), 1).reshape((c, -1))
    input_label = target.ravel().astype(np.int32).copy()
    input_prob = np.exp(x - x.max(axis=0, keepdims=True))
    input_prob /= input_prob.sum(axis=0, keepdims=True)
    valid_flag = input_label != -1
    valid_inds = np.where(valid_flag)[0]
    label = input_label[valid_flag]
    num_valid = valid_flag.sum()
    if min_kept >= num_valid:
        pass
    elif num_valid > 0:
        prob = input_prob[:, valid_flag]
        pred = prob[label, np.arange(len(label), dtype=np.int32)]
        threshold = thresh
        if min_kept > 0:
            index = pred.argsort()
            threshold_index = index[min(len(index), min_kept) - 1]
            if pred[threshold_index] > thresh:
                threshold = pred[threshold_index]
        kept_flag = pred <= threshold
        valid_inds = valid_inds[kept_flag]
    label = input_label[valid_inds].copy()
    input_label.fill(-1)
    input_label[valid_inds] = label
    ref_target = input_label.reshape(target.shape)

    w = torch.from_numpy(np.asarray(CITYSCAPES_CLASS_WEIGHTS, np.float32))
    theirs = float(
        torch.nn.CrossEntropyLoss(weight=w, ignore_index=-1)(
            torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
            torch.from_numpy(ref_target.astype(np.int64)),
        )
    )
    ours = float(
        ohem_cross_entropy_loss(
            jnp.asarray(logits),
            jnp.asarray(target),
            min_kept=min_kept,
            class_weights=CITYSCAPES_CLASS_WEIGHTS,
        )
    )
    assert abs(ours - theirs) < 1e-5


def test_loss_registry(rng):
    logits, target = _rand_logits_target(rng, c=2, ignore_frac=0.0)
    target = np.clip(target, 0, 1)
    for name in ("dice", "focal_dice", "ce", "ce_plain"):
        fn = get_loss_fn(name, aux=True, num_classes=2)
        val = float(fn((jnp.asarray(logits), jnp.asarray(logits)), jnp.asarray(target)))
        assert np.isfinite(val)


@requires_torch
def test_plain_mix_ce_matches_torch(rng):
    import torch

    logits, target = _rand_logits_target(rng)
    aux, _ = _rand_logits_target(rng)
    ours = float(
        mix_cross_entropy_loss((jnp.asarray(logits), jnp.asarray(aux)), jnp.asarray(target))
    )
    ce = torch.nn.CrossEntropyLoss(ignore_index=-1)
    tl = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    ta = torch.from_numpy(np.transpose(aux, (0, 3, 1, 2)))
    tt = torch.from_numpy(target)
    theirs = float(ce(tl, tt) + 0.2 * ce(ta, tt))
    assert abs(ours - theirs) < 1e-5


def test_losses_accept_low_res_logits():
    """loss(low-res logits) == loss(resize(logits)) — the train step hands
    losses 1/8-res outputs and the upsample happens inside the loss."""
    import jax
    import jax.numpy as jnp

    from fastscnn_tpu.losses import (
        dice_loss,
        focal_dice_loss,
        cross_entropy_loss,
        ohem_cross_entropy_loss,
        mix_dice_loss,
    )
    from fastscnn_tpu.ops.resize import resize_bilinear

    rng = np.random.default_rng(7)
    for C in (2, 19):
        lo = jnp.asarray(rng.standard_normal((2, 12, 12, C)).astype(np.float32))
        target = jnp.asarray(rng.integers(0, C, (2, 48, 48)).astype(np.int32))
        full = resize_bilinear(lo, (48, 48), align_corners=True)
        for fn in (dice_loss, focal_dice_loss, cross_entropy_loss,
                   ohem_cross_entropy_loss):
            a = float(fn(lo, target))
            b = float(fn(full, target))
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6), fn
        a = float(mix_dice_loss((lo, lo), target))
        b = float(mix_dice_loss((full, full), target))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_focal_dice_binary_fast_path_clips_ignore_labels():
    """The C=2 sigmoid-of-difference fast path must clip out-of-range
    targets (255 borders) exactly like the general path's _select_class —
    regression: an unclipped sign trick gives sign=509 and exploding CE.
    Expected value recomputed via the independent resize→softmax route."""
    import jax
    import jax.numpy as jnp

    from fastscnn_tpu.losses import focal_dice_loss
    from fastscnn_tpu.ops.resize import resize_bilinear

    rng = np.random.default_rng(11)
    lo = jnp.asarray(rng.standard_normal((2, 12, 12, 2)).astype(np.float32))
    target = rng.integers(0, 2, (2, 48, 48)).astype(np.int32)
    target[:, :4, :] = 255  # ignore border
    target = jnp.asarray(target)

    got = float(focal_dice_loss(lo, target))
    assert np.isfinite(got) and got < 50.0

    # independent general-path recomputation
    alpha, gamma, dice_weight, smooth = 0.5, 2.0, 0.5, 1e-6
    up = resize_bilinear(lo, (48, 48), align_corners=True).astype(jnp.float32)
    logp = jax.nn.log_softmax(up, axis=-1)
    tc = jnp.clip(target, 0, 1)
    ce = -jnp.take_along_axis(logp, tc[..., None], axis=-1)[..., 0]
    pt = jnp.exp(-ce)
    focal = jnp.mean(alpha * (1 - pt) ** gamma * ce)
    prob = jax.nn.softmax(up, axis=-1)[..., 1]
    t = target.reshape(-1).astype(jnp.float32)
    p = prob.reshape(-1)
    dice = 1.0 - (2.0 * jnp.sum(p * t) + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)
    expected = float((1 - dice_weight) * focal + dice_weight * dice)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_binary_sigmoid_diff_identity():
    """C=2 shortcut: sigmoid(z1-z0) path == softmax(z)[..., 1] path (the
    general-C code) on identical full-res logits."""
    import jax
    import jax.numpy as jnp

    from fastscnn_tpu.losses import dice_loss

    rng = np.random.default_rng(3)
    z = rng.standard_normal((2, 16, 16, 2)).astype(np.float32)
    target = jnp.asarray(rng.integers(0, 2, (2, 16, 16)).astype(np.int32))
    a = float(dice_loss(jnp.asarray(z), target))
    # reference formulation computed by hand
    prob = jax.nn.softmax(jnp.asarray(z), axis=-1)[..., 1]
    p = prob.reshape(-1)
    t = target.reshape(-1).astype(jnp.float32)
    inter = jnp.sum(p * t)
    b = float(1.0 - (2 * inter + 1e-6) / (jnp.sum(p) + jnp.sum(t) + 1e-6))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_get_loss_fn_aux_false_ignores_aux_head(rng):
    """aux=False must train on the main head only, even when the model
    emits an aux output (the flag was previously dead)."""
    import jax.numpy as jnp

    logits = jnp.asarray(rng.standard_normal((2, 16, 16, 2)).astype(np.float32))
    aux_logits = jnp.asarray(rng.standard_normal((2, 16, 16, 2)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, 2, (2, 16, 16)).astype(np.int32))

    with_aux = get_loss_fn("dice", aux=True)((logits, aux_logits), target)
    without = get_loss_fn("dice", aux=False)((logits, aux_logits), target)
    main_only = get_loss_fn("dice", aux=True)((logits,), target)
    assert float(without) == float(main_only)
    assert float(without) != float(with_aux)


def test_registry_unknown_dataset_clear_error():
    from fastscnn_tpu.models.registry import get_fast_scnn

    with pytest.raises(ValueError, match="num_classes"):
        get_fast_scnn("pascal_voc")
