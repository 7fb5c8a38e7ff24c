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

Design: a separable lerp-gather. For each output axis position we
precompute (at trace time, as static numpy) the two source indices and
the fractional weight, then do two ``jnp.take`` gathers and a fused
multiply-add per axis. Cost is O(N · H_out · W_out · C) — far cheaper
than a dense interpolation-matrix matmul at 2048×1024 output — and XLA
fuses the lerp into the gathers. All shapes are static under jit.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

__all__ = ["resize_bilinear", "resize_nearest"]


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
