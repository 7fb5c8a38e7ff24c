"""Pooling ops with exact PyTorch bin semantics, NHWC layout.

``AdaptiveAvgPool2d`` (used by the pyramid-pooling module at
reference:models/fast_scnn.py:130-132 with output sizes 1/2/3/6) computes
per-output-cell bins ``[floor(i*In/Out), ceil((i+1)*In/Out))`` — which for
In not divisible by Out differs from any fixed-stride pooling. Output
sizes here are tiny (≤6), so we unroll the bins in Python at trace time;
XLA fuses the slice-mean-stack into a handful of reductions.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["adaptive_avg_pool", "avg_pool", "max_pool"]


def _adaptive_bins(in_size: int, out_size: int):
    return [
        ((i * in_size) // out_size, -((-(i + 1) * in_size) // out_size))
        for i in range(out_size)
    ]


def _adaptive_pool_axis(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    pieces = []
    for start, stop in _adaptive_bins(in_size, out_size):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(start, stop)
        pieces.append(jnp.mean(x[tuple(sl)], axis=axis, keepdims=True))
    return jnp.concatenate(pieces, axis=axis)


def adaptive_avg_pool(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """``AdaptiveAvgPool2d(output_size)`` for NHWC tensors.

    The 2-D adaptive pool is separable because PyTorch's H and W bins are
    independent, so we pool H then W.
    """
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    out_h, out_w = output_size
    x = _adaptive_pool_axis(x, 1, int(out_h))
    x = _adaptive_pool_axis(x, 2, int(out_w))
    return x


def avg_pool(x: jnp.ndarray, window: int, stride: int | None = None, padding: int = 0) -> jnp.ndarray:
    """Fixed ``AvgPool2d`` (NHWC) — the ONNX-compatible pyramid pooling
    replacement uses fixed windows 32/16/8/4 (reference:export_onnx_fixed.py:106-118)."""
    stride = window if stride is None else stride
    pads = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, window, window, 1), (1, stride, stride, 1), pads
    )
    return summed / float(window * window)


def max_pool(x: jnp.ndarray, window: int, stride: int | None = None, padding: int = 0) -> jnp.ndarray:
    stride = window if stride is None else stride
    pads = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, window, window, 1), (1, stride, stride, 1), pads
    )
