"""NHWC convolution + batch-norm primitives and BN folding.

All convolutions use ``lax.conv_general_dilated`` with
``('NHWC', 'HWIO', 'NHWC')`` dimension numbers — the layout the TPU MXU
wants — and f32 accumulation regardless of the input dtype.

Batch norm follows PyTorch semantics exactly (momentum 0.1 meaning
``new = (1-m)·old + m·batch``, eps 1e-5, running var uses the *unbiased*
batch variance while normalization uses the biased one), so imported
reference checkpoints (reference:models/fast_scnn.py passim) reproduce
identical outputs and training matches step-for-step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "conv2d",
    "batch_norm_apply",
    "batch_norm_train",
    "fold_conv_bn",
    "BN_EPS",
    "BN_MOMENTUM",
]

BN_EPS = 1e-5
BN_MOMENTUM = 0.1

_DIMS = ("NHWC", "HWIO", "NHWC")


def f32_precision(dtype):
    """Precision override for f32 contractions on TPU.

    TPU's DEFAULT matmul/conv precision truncates f32 operands to bf16
    (measured ~8e-3 divergence vs torch), silently downgrading the
    --no-fp16 "full f32" path and every deliberate .astype(f32)-for-
    exactness. HIGHEST restores true f32 products there. Other backends
    (CPU/GPU f32) are already exact and keep the default — HIGHEST convs
    lower pathologically slowly on XLA:CPU. bf16 inputs always keep the
    fast default (the MXU accumulates their products in f32 regardless).
    """
    if dtype == jnp.float32 and jax.default_backend() in ("tpu", "axon"):
        return lax.Precision.HIGHEST
    return None


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
) -> jnp.ndarray:
    """2-D convolution, NHWC activations / HWIO weights.

    ``groups == in_channels`` with an HWIO weight of shape (kh, kw, 1, C)
    is a depthwise conv (multiplier 1), which is all the reference uses
    (reference:models/fast_scnn.py:70,86).

    Output dtype == input dtype. The TPU MXU accumulates bf16 products in
    f32 internally regardless, so a bf16-in/bf16-out conv keeps f32
    accumulation while halving HBM traffic; forcing an f32 output via
    ``preferred_element_type`` would also break the AD transpose (f32
    cotangent vs bf16 operand).
    """
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=_DIMS,
        feature_group_count=groups,
        precision=f32_precision(x.dtype),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def batch_norm_apply(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    eps: float = BN_EPS,
) -> jnp.ndarray:
    """Inference-mode BN using running statistics (channel-last)."""
    inv = lax.rsqrt(var.astype(jnp.float32) + eps) * scale.astype(jnp.float32)
    shift = bias.astype(jnp.float32) - mean.astype(jnp.float32) * inv
    return (x * inv.astype(x.dtype) + shift.astype(x.dtype)).astype(x.dtype)


def batch_norm_train(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    momentum: float = BN_MOMENTUM,
    eps: float = BN_EPS,
):
    """Training-mode BN: normalize with batch moments, update running stats.

    Returns (y, new_running_mean, new_running_var). Moments are computed
    in f32 even for bf16 activations. Under a sharded jit the reductions
    over (N, H, W) become cross-replica collectives automatically —
    i.e. sync-BN over the data-parallel mesh.
    """
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    batch_mean = jnp.mean(xf, axis=axes)
    # Two-pass variance: E[(x-μ)²]. The one-pass E[x²]-μ² form loses to
    # catastrophic cancellation once activations grow (negative variance →
    # rsqrt → NaN), which torch's batch_norm never exhibits.
    batch_var = jnp.mean(jnp.square(xf - batch_mean), axis=axes)
    n = 1
    for a in axes:
        n *= x.shape[a]
    # PyTorch stores the unbiased variance in running stats.
    unbiased = batch_var * (n / max(n - 1, 1))
    new_mean = (1 - momentum) * running_mean.astype(jnp.float32) + momentum * batch_mean
    new_var = (1 - momentum) * running_var.astype(jnp.float32) + momentum * unbiased
    inv = lax.rsqrt(batch_var + eps) * scale.astype(jnp.float32)
    shift = bias.astype(jnp.float32) - batch_mean * inv
    y = (x * inv.astype(x.dtype) + shift.astype(x.dtype)).astype(x.dtype)
    return y, new_mean, new_var


def fold_conv_bn(
    w: jnp.ndarray,
    b: jnp.ndarray | None,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    eps: float = BN_EPS,
):
    """Fold inference-mode BN into the preceding conv's weight/bias.

    ``y = BN(conv(x) + b)`` becomes ``conv'(x) + b'`` with
    ``w' = w · s``, ``b' = (b − mean)·s + bias`` where
    ``s = scale / sqrt(var + eps)`` (broadcast over the O axis of HWIO).
    This removes every BN from the inference graph — the main lever for
    the ≥1e3 fps/chip target.
    """
    w = w.astype(jnp.float32)
    s = scale.astype(jnp.float32) * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    w_f = w * s.reshape((1, 1, 1, -1))
    b0 = jnp.zeros_like(mean, dtype=jnp.float32) if b is None else b.astype(jnp.float32)
    b_f = (b0 - mean.astype(jnp.float32)) * s + bias.astype(jnp.float32)
    return w_f, b_f
