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

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "conv2d",
    "conv2d_tapbwd",
    "dw_conv2d_taps",
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


def _conv_out_len(size: int, k: int, stride: int, padding: int) -> int:
    return (size + 2 * padding - k) // stride + 1


def _conv_dx(g, w, stride, padding, groups, x_shape, precision):
    """Input cotangent of :func:`conv2d`: the transposed convolution,
    expressed directly as a dilated conv (what jax's AD transpose emits,
    written out so a custom backward can reuse it unchanged)."""
    kh, kw, _, _ = w.shape
    wt = jnp.flip(w, (0, 1))
    if groups == 1:
        wt = wt.swapaxes(2, 3)  # HWIO with I ↔ O
    # groups == C (depthwise, multiplier 1): (kh, kw, 1, C) stays — each
    # channel's cotangent convolves with its own flipped tap stencil.
    rh = (x_shape[1] + 2 * padding - kh) % stride
    rw = (x_shape[2] + 2 * padding - kw) % stride
    return lax.conv_general_dilated(
        g,
        wt,
        window_strides=(1, 1),
        padding=[(kh - 1 - padding, kh - 1 - padding + rh),
                 (kw - 1 - padding, kw - 1 - padding + rw)],
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMS,
        feature_group_count=groups,
        precision=precision,
    )


def _conv_dw_taps(x, g, kh, kw, stride, padding, groups, precision):
    """Weight cotangent as per-tap contractions instead of XLA's
    kernel-grad convolution.

    For each of the kh·kw taps, the contribution to dW is a plain
    contraction over (N, Ho, Wo) between a strided window of x and the
    output cotangent — a tall-skinny MXU matmul (dense conv) or an
    elementwise multiply-reduce (depthwise). Motivation: on TPU, XLA's
    kernel-grad convolution for the small-C stem convs runs far below
    bandwidth (measured 147 GB/s for conv1's dW — docs/PERFORMANCE.md
    §"Training: the 19-class Cityscapes recipe traced"); the tap
    formulation exposes the reduction directly to XLA's reduce/matmul
    codegen instead of its conv emitter. Semantically identical (same
    sums, reassociated).
    """
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    n, _, _, cin = x.shape
    ho, wo = g.shape[1], g.shape[2]
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)  # f32 accum for bf16 in
    taps = []
    for di in range(kh):
        for dj in range(kw):
            xv = lax.slice(
                x,
                (0, di, dj, 0),
                (n, di + (ho - 1) * stride + 1, dj + (wo - 1) * stride + 1, cin),
                (1, stride, stride, 1),
            )
            if groups == 1:
                taps.append(
                    lax.dot_general(
                        xv,
                        g,
                        (((0, 1, 2), (0, 1, 2)), ((), ())),
                        precision=precision,
                        preferred_element_type=acc_dtype,
                    )
                )  # (Cin, Cout)
            else:
                # depthwise multiplier-1: dW[·, ·, 0, c] = Σ x·g per channel
                taps.append(
                    jnp.sum(
                        xv.astype(acc_dtype) * g.astype(acc_dtype), axis=(0, 1, 2)
                    )[None, :]
                )  # (1, C)
    cin_w = cin if groups == 1 else 1
    cout = g.shape[-1]
    dw = jnp.stack(taps).reshape(kh, kw, cin_w, cout)
    return dw


def _conv2d_tapbwd_impl(x, w, stride, padding, groups):
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=_DIMS,
        feature_group_count=groups,
        precision=f32_precision(x.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv2d_tapbwd(x, w, stride, padding, groups):
    return _conv2d_tapbwd_impl(x, w, stride, padding, groups)


def _conv2d_tapbwd_fwd(x, w, stride, padding, groups):
    return _conv2d_tapbwd_impl(x, w, stride, padding, groups), (x, w)


def _conv2d_tapbwd_bwd(stride, padding, groups, res, g):
    x, w = res
    kh, kw = w.shape[0], w.shape[1]
    prec = f32_precision(x.dtype)
    wc = w.astype(x.dtype)
    dx = _conv_dx(g, wc, stride, padding, groups, x.shape, prec)
    dw = _conv_dw_taps(x, g, kh, kw, stride, padding, groups, prec).astype(w.dtype)
    return dx, dw


_conv2d_tapbwd.defvjp(_conv2d_tapbwd_fwd, _conv2d_tapbwd_bwd)


def conv2d_tapbwd(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
) -> jnp.ndarray:
    """:func:`conv2d` with a hand-written backward (same forward HLO).

    dX is the identical transposed conv jax's AD emits; dW switches from
    XLA's kernel-grad convolution to per-tap contractions
    (:func:`_conv_dw_taps`). Use for the small-channel stem convs where
    the kernel-grad conv underutilizes the TPU (see
    docs/PERFORMANCE.md); for MXU-sized convs XLA's native backward is
    already good. Numerics: dW accumulates in f32 (vs the native
    backward's bf16 conv output under bf16 training) — at least as
    accurate, parity-tested against ``jax.vjp`` of :func:`conv2d`.
    """
    y = _conv2d_tapbwd(x, w, stride, padding, groups)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def dw_conv2d_taps(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 1,
    groups: int | None = None,  # accepted for conv_fn signature parity
) -> jnp.ndarray:
    """Depthwise conv as explicit tap accumulation (shifted strided-slice
    FMAs) instead of ``lax.conv_general_dilated``.

    Each of the kh·kw taps is one elementwise multiply-add over a strided
    window of x — pure VPU work whose slices never touch the lane (C)
    axis, so XLA lowers it as fused vector code rather than through its
    conv emitter (whose depthwise path measured 169 GB/s — well below
    bandwidth — on the stem's small-C stride-2 shapes;
    docs/PERFORMANCE.md). Accumulates in f32 and casts once at the end,
    matching the conv op's internal f32 accumulation. jax AD of the
    slices gives the tap-formulated backward automatically (slice ↔ pad,
    multiply-reduce for dW).
    """
    kh, kw, _, c = w.shape
    if groups is not None and groups != x.shape[-1]:
        raise ValueError("dw_conv2d_taps is depthwise-only (groups == C)")
    if c != x.shape[-1]:
        raise ValueError(f"weight C {c} != input C {x.shape[-1]} (multiplier-1 only)")
    n = x.shape[0]
    ho = _conv_out_len(x.shape[1], kh, stride, padding)
    wo = _conv_out_len(x.shape[2], kw, stride, padding)
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)  # f32 accum for bf16 in
    wf = w.astype(acc_dtype)
    acc = None
    for di in range(kh):
        for dj in range(kw):
            xv = lax.slice(
                x,
                (0, di, dj, 0),
                (n, di + (ho - 1) * stride + 1, dj + (wo - 1) * stride + 1, c),
                (1, stride, stride, 1),
            )
            term = xv.astype(acc_dtype) * wf[di, dj, 0, :]
            acc = term if acc is None else acc + term
    y = acc.astype(x.dtype)
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
    packed: bool = False,
):
    """Training-mode BN: normalize with batch moments, update running stats.

    Returns (y, new_running_mean, new_running_var). Moments are computed
    in f32 even for bf16 activations. Under a sharded jit the reductions
    over (N, H, W) become cross-replica collectives automatically —
    i.e. sync-BN over the data-parallel mesh.

    ``packed=True`` (A/B candidate for the small-C stem,
    docs/PERFORMANCE.md "Staged for measurement"): every pass runs on the
    bitwise-free flat ``(total/L, L)`` view with ``L = lcm(C, 128)`` —
    full 128-lane registers instead of the C/128 fill XLA was measured
    at on the stem's BN ops (lane l of the flat view always holds
    channel ``l % C``, so the L/C per-group partial sums fold at the
    end). Pure reassociation; AD of the reshapes is reshapes, so the
    backward is lane-dense too. Applies whenever L divides the element
    count; falls through to the plain form otherwise.
    """
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)  # f32 moments for bf16
    if packed and x.ndim == 4:
        c = x.shape[-1]
        total = x.size
        l = math.lcm(c, 128)
        if c < 128 and total % l == 0:
            reps = l // c
            xflat = x.reshape(total // l, l)
            xf = xflat.astype(acc_dtype)
            count = total // c
            batch_mean = jnp.sum(xf, axis=0).reshape(reps, c).sum(0) / count
            mean_tiled = jnp.tile(batch_mean, reps)
            batch_var = (
                jnp.sum(jnp.square(xf - mean_tiled), axis=0).reshape(reps, c).sum(0)
                / count
            )
            unbiased = batch_var * (count / max(count - 1, 1))
            new_mean = (
                (1 - momentum) * running_mean.astype(acc_dtype) + momentum * batch_mean
            )
            new_var = (1 - momentum) * running_var.astype(acc_dtype) + momentum * unbiased
            inv = lax.rsqrt(batch_var + eps) * scale.astype(acc_dtype)
            shift = bias.astype(acc_dtype) - batch_mean * inv
            yflat = (
                xflat * jnp.tile(inv, reps).astype(x.dtype)
                + jnp.tile(shift, reps).astype(x.dtype)
            ).astype(x.dtype)
            return yflat.reshape(x.shape), new_mean, new_var
    xf = x.astype(acc_dtype)
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
    new_mean = (1 - momentum) * running_mean.astype(acc_dtype) + momentum * batch_mean
    new_var = (1 - momentum) * running_var.astype(acc_dtype) + momentum * unbiased
    inv = lax.rsqrt(batch_var + eps) * scale.astype(acc_dtype)
    shift = bias.astype(acc_dtype) - batch_mean * inv
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
