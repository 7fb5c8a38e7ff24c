"""Bilinear / nearest image resizing with exact PyTorch sampling semantics.

The reference network uses ``F.interpolate(..., mode='bilinear',
align_corners=True)`` in four places (final upsample, pyramid-pooling
upsample, feature-fusion upsample, aux-head upsample — see
reference:models/fast_scnn.py:40,135,212,44) and ``align_corners=False``
in the end-to-end export graph (reference:export_onnx_fixed.py:62-98).
``jax.image.resize`` implements neither exactly (it is the
``half_pixel`` convention without the align_corners source mapping and
uses a gather-free einsum formulation), so we implement both PyTorch
conventions directly.

Two formulations with identical sampling semantics:

- ``resize_bilinear``: a separable lerp-gather. For each output axis
  position we precompute (at trace time, as static numpy) the two source
  indices and the fractional weight, then do two ``jnp.take`` gathers
  and a fused multiply-add per axis. Minimal op count — but TPU lane
  gathers serialize badly: at the serving shape (×8 upsample of
  128×256×19 logits to 1024×2048) the gather path measured ~1.3 ms/frame,
  ~20× above its op floor (docs/PERFORMANCE.md).
- ``resize_bilinear_matmul``: the same weights as one dense
  interpolation matrix per axis, applied as MXU matmuls (cheapest
  contraction order chosen automatically). ~64× the FLOPs of the
  two-tap lerp at ×8, but MXU FLOPs are nearly free next to serialized
  gathers — this is the fast path for large upsamples on TPU.

All shapes are static under jit.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

__all__ = ["resize_bilinear", "resize_bilinear_matmul", "resize_nearest"]


@functools.lru_cache(maxsize=None)
def _axis_lerp_coeffs(in_size: int, out_size: int, align_corners: bool):
    """Source indices (lo, hi) and hi-weights for 1-D linear resampling.

    align_corners=True:  src = i * (in-1) / (out-1)          (PyTorch)
    align_corners=False: src = (i + 0.5) * in/out - 0.5, clamped at 0
    (PyTorch clamps negative source positions so edge pixels replicate.)
    """
    if out_size == 1:
        if align_corners:
            src = np.zeros(1, dtype=np.float64)
        else:
            src = np.asarray([0.5 * in_size / out_size - 0.5], dtype=np.float64)
    elif align_corners:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * in_size / out_size - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int32)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1).astype(np.int32)
    w = (src - lo).astype(np.float32)
    return lo, hi, w


def _lerp_axis(x: jnp.ndarray, axis: int, out_size: int, align_corners: bool):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    lo, hi, w = _axis_lerp_coeffs(in_size, out_size, align_corners)
    shape = [1] * x.ndim
    shape[axis] = out_size
    # Weights are computed in f32 and cast to the compute dtype; for bf16
    # activations this costs <1 ulp of the bf16 result.
    w = jnp.asarray(w, dtype=x.dtype).reshape(shape)
    x_lo = jnp.take(x, jnp.asarray(lo), axis=axis)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=axis)
    return x_lo + (x_hi - x_lo) * w


def resize_bilinear(
    x: jnp.ndarray,
    size: tuple[int, int],
    align_corners: bool = True,
    h_axis: int = 1,
    w_axis: int = 2,
) -> jnp.ndarray:
    """Bilinear resize to ``size=(H, W)`` along the given axes (works for
    NHWC 4-D tensors and for channel-free 3-D (N, H, W) tensors alike).

    Matches ``torch.nn.functional.interpolate(mode='bilinear')`` bit-for-bit
    in f32 for both ``align_corners`` conventions.

    TPU layout note: narrow trailing channel dims are lane-padded on TPU
    (a materialized (..., C=2) tensor occupies 64× its logical bytes), so
    full-resolution narrow-C resizes should be restructured by the caller
    to channel-free 3-D form where possible — see the exact
    sigmoid-of-difference shortcut in ``losses/segmentation.py``.
    """
    out_h, out_w = size
    x = _lerp_axis(x, h_axis, int(out_h), align_corners)
    x = _lerp_axis(x, w_axis, int(out_w), align_corners)
    return x


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool):
    """Dense (in_size, out_size) 1-D interpolation matrix with exactly the
    same two-tap weights as ``_axis_lerp_coeffs`` (two nonzeros per
    column; a clamped edge collapses to a single 1.0)."""
    lo, hi, w = _axis_lerp_coeffs(in_size, out_size, align_corners)
    a = np.zeros((in_size, out_size), np.float32)
    cols = np.arange(out_size)
    np.add.at(a, (lo, cols), 1.0 - w)
    np.add.at(a, (hi, cols), w)
    return a


def _matmul_axis(x: jnp.ndarray, axis: int, out_size: int, align_corners: bool):
    from fastscnn_tpu.ops.conv import f32_precision

    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    a = jnp.asarray(_interp_matrix(in_size, int(out_size), align_corners), x.dtype)
    # f32 inputs demand true f32 contraction on TPU — see
    # ops/conv.py::f32_precision (default precision truncates f32
    # operands to bf16 there, defeating every .astype(f32)-for-exactness
    # caller). bf16 inputs keep the fast default.
    # tensordot moves the contracted axis's replacement to the end; put it
    # back (XLA folds the transpose into the dot_general output layout).
    y = jnp.tensordot(x, a, axes=[[axis], [0]], precision=f32_precision(x.dtype))
    return jnp.moveaxis(y, -1, axis)


def resize_bilinear_matmul(
    x: jnp.ndarray,
    size: tuple[int, int],
    align_corners: bool = True,
    h_axis: int = 1,
    w_axis: int = 2,
) -> jnp.ndarray:
    """Bilinear resize via dense interpolation-matrix matmuls on the MXU.

    Identical sampling weights to ``resize_bilinear`` (same
    ``_axis_lerp_coeffs``); numerics differ only in summation order
    (matmul accumulates lo·w0 + hi·w1 instead of lo + (hi−lo)·w, with
    f32 MXU accumulation) — sub-ulp in f32, ≤1 ulp in bf16, so argmax
    masks can flip only at exact ties. Use for large upsamples on TPU
    where the gather path serializes (see module docstring)."""
    out_h, out_w = int(size[0]), int(size[1])
    n_other_h = x.size // x.shape[h_axis]   # elements per H-column
    n_other_w = x.size // x.shape[w_axis]
    # Contract the axis whose expansion is cheaper first, so the larger
    # contraction runs on the smaller intermediate (for ×8 upsampling of
    # (128, 256): W-first costs 12.8 GFLOP/frame vs 21.7 for H-first).
    cost_h_first = n_other_h * out_h * x.shape[h_axis] + (
        x.size // x.shape[h_axis] // x.shape[w_axis] * out_h
    ) * out_w * x.shape[w_axis]
    cost_w_first = n_other_w * out_w * x.shape[w_axis] + (
        x.size // x.shape[h_axis] // x.shape[w_axis] * out_w
    ) * out_h * x.shape[h_axis]
    if cost_w_first <= cost_h_first:
        x = _matmul_axis(x, w_axis, out_w, align_corners)
        x = _matmul_axis(x, h_axis, out_h, align_corners)
    else:
        x = _matmul_axis(x, h_axis, out_h, align_corners)
        x = _matmul_axis(x, w_axis, out_w, align_corners)
    return x


@functools.lru_cache(maxsize=None)
def _axis_nearest_index(in_size: int, out_size: int):
    # PyTorch 'nearest' (legacy, what cv2.resize INTER_NEAREST and
    # reference postprocessing use): src = floor(i * in/out).
    src = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    return np.clip(src.astype(np.int32), 0, in_size - 1)


def resize_nearest(
    x: jnp.ndarray,
    size: tuple[int, int],
    h_axis: int = 1,
    w_axis: int = 2,
) -> jnp.ndarray:
    """Nearest-neighbour resize (PyTorch legacy / OpenCV convention).

    Used for mask upsampling in the postprocessing path
    (reference:onnx_single_image_inference.py:210-236).
    """
    out_h, out_w = size
    if x.shape[h_axis] != out_h:
        x = jnp.take(x, jnp.asarray(_axis_nearest_index(x.shape[h_axis], int(out_h))), axis=h_axis)
    if x.shape[w_axis] != out_w:
        x = jnp.take(x, jnp.asarray(_axis_nearest_index(x.shape[w_axis], int(out_w))), axis=w_axis)
    return x
