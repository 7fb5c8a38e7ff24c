"""Segmentation losses — Dice / Focal-Dice / CE / OHEM CE, all on-device.

Functional ports of reference:utils/loss.py with identical semantics.
Logits are NHWC (class axis last); targets are (N, H, W) int32.

The OHEM loss is the interesting one: the reference mines hard pixels on
the **CPU in numpy** per step (reference:utils/loss.py:151-180) — a
device→host→device round-trip in the middle of the hot loop. Here it is
a fixed-shape on-device formulation: one ``lax.top_k`` of size
``min_kept`` over the flattened true-class probabilities replaces the
argsort, and all the reference's edge cases (fewer valid pixels than
``min_kept``; k-th prob below the threshold) fall out of an ``inf``
fill — identical kept-pixel sets, zero host sync.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# The matmul formulation: same bilinear weights as the two-tap gather
# path, applied as MXU contractions. In the training step this is a pure
# win — the gather's backward is a scatter, which serializes on TPU.
# Measured (interleaved A/B, v5e, 2026-08-17): 19-class CE bs16 768²
# 251 → 394 samples/s (+57%); 2-class dice bs64 480² 1,639 → 1,807
# (+10%). Numerics differ from the gather path only in f32 summation
# order (sub-ulp vs the torch reference's tolerance).
from fastscnn_tpu.ops.resize import resize_bilinear_matmul as resize_bilinear

__all__ = [
    "dice_loss",
    "mix_dice_loss",
    "focal_dice_loss",
    "cross_entropy_loss",
    "mix_cross_entropy_loss",
    "ohem_cross_entropy_loss",
    "mix_ohem_cross_entropy_loss",
    "get_loss_fn",
    "CITYSCAPES_CLASS_WEIGHTS",
]

# Hard-coded Cityscapes class-balance weights (reference:utils/loss.py:135-137).
CITYSCAPES_CLASS_WEIGHTS = (
    0.8373, 0.918, 0.866, 1.0345, 1.0166, 0.9969, 0.9754,
    1.0489, 0.8786, 1.0023, 0.9539, 0.9843, 1.1116, 0.9037, 1.0865, 1.0955,
    1.0865, 1.1529, 1.0507,
)


def _match_resolution(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Losses accept logits at any spatial resolution: when it differs from
    the target's, the network's final ``align_corners=True`` upsample
    (reference:models/fast_scnn.py:40) happens here inside the loss. This
    lets the train step ask the model for LOW-RES logits
    (``apply(..., upsample_outputs=False)``) so narrow-C algebraic
    shortcuts below can avoid ever materializing the full-resolution
    class-minor tensor, which TPU lane-pads 64× at C=2."""
    if logits.ndim == 4 and target.ndim >= 3 and logits.shape[1:3] != target.shape[1:3]:
        logits = resize_bilinear(logits, target.shape[1:3], align_corners=True)
    return logits


def _binary_diff_at_target_res(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """(N, h, w, 2) logits → (N, H, W) class-1-minus-class-0 logit at the
    target resolution. Exact: ``softmax(z)[..., 1] == sigmoid(z1 - z0)``
    and bilinear resizing is linear, so resizing the single-channel
    difference equals differencing the resized channels — while the
    channel-free 3-D tensor has a clean (8, 128) layout (no lane padding)
    and its resize backward is 2 channels cheaper."""
    d = (logits[..., 1] - logits[..., 0]).astype(jnp.float32)
    if target.ndim >= 3 and d.shape[1:3] != target.shape[1:3]:
        d = resize_bilinear(d, target.shape[1:3], align_corners=True, h_axis=1, w_axis=2)
    return d


def _dice_from_prob(prob: jnp.ndarray, target: jnp.ndarray, smooth: float) -> jnp.ndarray:
    """1 − dice on a precomputed class-1 probability map. Like the
    reference, the raw target values enter the sums (no ignore masking —
    reference:utils/loss.py:24-32)."""
    p = prob.reshape(-1)
    t = target.reshape(-1).astype(jnp.float32)
    inter = jnp.sum(p * t)
    dice = (2.0 * inter + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)
    return 1.0 - dice


def dice_loss(logits: jnp.ndarray, target: jnp.ndarray, smooth: float = 1e-6) -> jnp.ndarray:
    """Binary Dice on the class-1 probability (reference:utils/loss.py:12-39).

    Multi-channel logits → softmax class-1 prob; single-channel → sigmoid.
    """
    if logits.ndim == 4 and logits.shape[-1] == 2:
        prob = jax.nn.sigmoid(_binary_diff_at_target_res(logits, target))
    else:
        logits = _match_resolution(logits, target)
        lf = logits.astype(jnp.float32)
        if logits.ndim == 4 and logits.shape[-1] > 1:
            prob = jax.nn.softmax(lf, axis=-1)[..., 1]
        elif logits.ndim == 4:
            prob = jax.nn.sigmoid(lf[..., 0])
        else:
            prob = jax.nn.sigmoid(lf)
    return _dice_from_prob(prob, target, smooth)


def mix_dice_loss(outputs, target, aux_weight: float = 0.4, smooth: float = 1e-6):
    """Main + aux_weight · aux dice (reference:utils/loss.py:42-68)."""
    loss = dice_loss(outputs[0], target, smooth)
    if len(outputs) > 1:
        loss = loss + aux_weight * dice_loss(outputs[1], target, smooth)
    return loss


def _select_class(values: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """``values[..., target]`` as a one-hot contraction.

    ``take_along_axis`` over the class (lane) axis lowers to a per-pixel
    lane gather on TPU — measured ~5× the cost of the whole forward pass
    at 768² inputs. A one-hot multiply-reduce is a plain VPU pattern."""
    tc = jnp.clip(target, 0, values.shape[-1] - 1)
    onehot = jax.nn.one_hot(tc, values.shape[-1], dtype=values.dtype)
    return jnp.sum(values * onehot, axis=-1)


def _per_pixel_ce(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Unreduced CE; target clipped into range (callers mask)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -_select_class(logp, target)


def focal_dice_loss(
    logits,
    target,
    alpha: float = 0.5,
    gamma: float = 2.0,
    dice_weight: float = 0.5,
    smooth: float = 1e-6,
):
    """(1-dw)·focal + dw·dice (reference:utils/loss.py:71-100)."""
    if logits.ndim == 4 and logits.shape[-1] == 2:
        # 2-class CE via the logit difference: -log softmax(z)[t] ==
        # -log_sigmoid((2t-1)·(z1-z0)) — channel-free at full res.
        # Target clipped into [0, 1] exactly as the general path's
        # _select_class does (out-of-range/ignore labels otherwise blow
        # up the sign trick); dice reuses the same resized difference.
        d = _binary_diff_at_target_res(logits, target)
        sign = 2.0 * jnp.clip(target, 0, 1).astype(jnp.float32) - 1.0
        ce = -jax.nn.log_sigmoid(sign * d)
        pt = jnp.exp(-ce)
        focal = jnp.mean(alpha * (1 - pt) ** gamma * ce)
        dice = _dice_from_prob(jax.nn.sigmoid(d), target, smooth)
        return (1 - dice_weight) * focal + dice_weight * dice
    logits = _match_resolution(logits, target)
    lf = logits.astype(jnp.float32)
    if logits.ndim == 4 and logits.shape[-1] > 1:
        ce = _per_pixel_ce(lf, target)
        pt = jnp.exp(-ce)
    else:
        prob = jax.nn.sigmoid(lf[..., 0] if logits.ndim == 4 else lf)
        tf_ = target.astype(jnp.float32)
        eps = 1e-12
        ce = -(tf_ * jnp.log(prob + eps) + (1 - tf_) * jnp.log(1 - prob + eps))
        pt = jnp.where(tf_ == 1, prob, 1 - prob)
    focal = jnp.mean(alpha * (1 - pt) ** gamma * ce)
    return (1 - dice_weight) * focal + dice_weight * dice_loss(logits, target, smooth)


def cross_entropy_loss(
    logits, target, ignore_label: int = -1, class_weights=None
) -> jnp.ndarray:
    """CE with ignore label and optional class weights; weighted-mean
    reduction exactly as ``torch.nn.CrossEntropyLoss`` (denominator = sum
    of kept-pixel weights)."""
    logits = _match_resolution(logits, target)
    valid = (target != ignore_label).astype(jnp.float32)
    ce = _per_pixel_ce(logits, target)
    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)
        tc = jnp.clip(target, 0, logits.shape[-1] - 1)
        pw = jnp.sum(jax.nn.one_hot(tc, logits.shape[-1], dtype=jnp.float32) * w, axis=-1)
        ce = ce * pw
        denom = jnp.sum(pw * valid)
    else:
        denom = jnp.sum(valid)
    return jnp.sum(ce * valid) / jnp.maximum(denom, 1e-12)


def mix_cross_entropy_loss(outputs, target, aux_weight: float = 0.2, ignore_label: int = -1):
    """reference:utils/loss.py:103-124."""
    loss = cross_entropy_loss(outputs[0], target, ignore_label)
    for aux_logits in outputs[1:]:
        loss = loss + aux_weight * cross_entropy_loss(aux_logits, target, ignore_label)
    return loss


def _kth_smallest_nonneg(x_flat: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact k-th smallest of a non-negative f32 vector (+inf allowed).

    ``lax.top_k`` over millions of pixels measured ~0.5 s/step on v5e at
    768² inputs. For non-negative IEEE floats the int32 bit pattern is
    order-isomorphic to the value, so 31 fixed bisection steps on the bit
    range — each a cheap full reduction — find the exact k-th order
    statistic (same selected value as a sort, ties included)."""
    bits = lax.bitcast_convert_type(x_flat, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // 2
        kth_above_mid = jnp.sum(bits <= mid) < k
        return (jnp.where(kth_above_mid, mid + 1, lo), jnp.where(kth_above_mid, hi, mid))

    lo, _ = lax.fori_loop(
        0, 31, body, (jnp.int32(0), jnp.int32(0x7F800000))  # [0.0, +inf]
    )
    return lax.bitcast_convert_type(lo, jnp.float32)


def ohem_cross_entropy_loss(
    logits,
    target,
    ignore_label: int = -1,
    thresh: float = 0.7,
    min_kept: int = 256,
    class_weights=None,
):
    """Online hard example mining CE, fully on device.

    Semantics-equivalent to reference:utils/loss.py:127-182: keep the
    ``min_kept`` hardest valid pixels (lowest true-class prob), extending
    to all pixels whose prob ≤ max(thresh, k-th smallest prob); ignore the
    rest; then class-weighted CE over the kept set.
    """
    logits = _match_resolution(logits, target)
    lf = logits.astype(jnp.float32)
    valid = target != ignore_label

    # One fused per-pixel CE map drives BOTH the mining and the loss:
    # ce = lse(l) − l_t, true-class prob = exp(−ce). The earlier
    # formulation materialized softmax (mining) AND log_softmax (loss) as
    # separate full-resolution C-channel f32 tensors — at the Cityscapes
    # recipe (768² bs16 C=19) that is 2 × 716 MB of HBM traffic per head
    # plus their backward; here the C-channel reductions fuse into the
    # upsample output and only (N,H,W) f32 maps are materialized.
    lse = jax.nn.logsumexp(lf, axis=-1)
    logit_t = _select_class(lf, target)
    ce_pix = lse - logit_t  # ≥ 0 up to rounding
    true_prob = jnp.exp(-ce_pix)

    flat = jnp.where(valid, true_prob, jnp.inf).reshape(-1)
    k = min(int(min_kept), flat.shape[0])
    if k > 0:
        # Exact k-th smallest. If fewer than k valid pixels exist the k-th
        # value is +inf → keep all valid, matching the reference's
        # min_kept >= num_valid early-out.
        kth = _kth_smallest_nonneg(flat, k)
        threshold = jnp.maximum(kth, thresh)
    else:
        threshold = jnp.asarray(thresh, jnp.float32)
    kept = (valid & (true_prob <= threshold)).astype(jnp.float32)

    # Weighted-mean reduction over the kept set, exactly
    # torch.nn.CrossEntropyLoss(weight, ignore_index) semantics
    # (denominator = sum of kept-pixel class weights).
    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)
        tc = jnp.clip(target, 0, logits.shape[-1] - 1)
        pw = jnp.sum(jax.nn.one_hot(tc, logits.shape[-1], dtype=jnp.float32) * w, axis=-1)
        num = jnp.sum(ce_pix * pw * kept)
        den = jnp.sum(pw * kept)
    else:
        num = jnp.sum(ce_pix * kept)
        den = jnp.sum(kept)
    return num / jnp.maximum(den, 1e-12)


def mix_ohem_cross_entropy_loss(
    outputs,
    target,
    aux_weight: float = 0.2,
    ignore_label: int = -1,
    thresh: float = 0.7,
    min_kept: int = 256,
    class_weights=None,
):
    """OHEM + aux blending (reference:utils/loss.py:185-206) — the
    trainer's 'ce' loss option (reference:train.py:190-191)."""
    loss = ohem_cross_entropy_loss(outputs[0], target, ignore_label, thresh, min_kept, class_weights)
    for aux_logits in outputs[1:]:
        loss = loss + aux_weight * ohem_cross_entropy_loss(
            aux_logits, target, ignore_label, thresh, min_kept, class_weights
        )
    return loss


def get_loss_fn(
    name: str,
    aux: bool = False,
    aux_weight: float = 0.4,
    num_classes: int | None = None,
    ignore_label: int = -1,
    use_class_weights: bool = True,
):
    """Loss registry mirroring the trainer's selection
    (reference:train.py:183-192): 'dice' → MixDice, 'focal_dice' →
    FocalDice on the main output (the reference passes the raw output
    *tuple* into FocalDiceLoss, which would crash on `pred.dim()` —
    a latent reference bug; we use the main head), 'ce' → Mix OHEM CE
    with the trainer's aux_weight (CLI default 0.4) and the Cityscapes
    class weights when ``num_classes == 19``.

    ``aux=False`` trains on the MAIN head only even if the model emits an
    aux output (the mix_* losses blend every extra output otherwise)."""
    if not aux:
        main_only = get_loss_fn(
            name, aux=True, aux_weight=aux_weight, num_classes=num_classes,
            ignore_label=ignore_label, use_class_weights=use_class_weights,
        )
        return lambda outputs, target: main_only(outputs[:1], target)
    if name == "dice":
        return functools.partial(mix_dice_loss, aux_weight=aux_weight)
    if name == "focal_dice":
        return lambda outputs, target: focal_dice_loss(outputs[0], target)
    if name == "ce":
        weights = (
            CITYSCAPES_CLASS_WEIGHTS
            if (use_class_weights and num_classes == 19)
            else None
        )
        return functools.partial(
            mix_ohem_cross_entropy_loss,
            aux_weight=aux_weight,
            ignore_label=ignore_label,
            class_weights=weights,
        )
    if name == "ce_plain":
        return functools.partial(mix_cross_entropy_loss, ignore_label=ignore_label)
    raise ValueError(f"unknown loss '{name}' (expected dice|focal_dice|ce|ce_plain)")
