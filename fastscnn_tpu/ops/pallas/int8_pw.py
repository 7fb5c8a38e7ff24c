"""Fused int8 pointwise-conv (1×1) Pallas kernels with in-kernel requant.

Why: the serving graph's FFM/classifier/bottleneck pointwise convs run
at 600-700 GB/s — already near HBM bandwidth in bf16 — so the only
remaining lever on them is *moving fewer bytes*. XLA cannot express
that: its s8×s8→s32 conv runs at bf16 speed and the requant epilogue
does not fuse (the s32 tensor round-trips HBM at full size — measured
2.9× slower, docs/PERFORMANCE.md "rejected" table). A Pallas kernel
keeps the s32/f32 accumulator in VMEM and writes the requantized int8
(or bf16) result directly: activations cross HBM at 1 byte instead of
2 in each direction.

The round-3 PTQ accuracy study (tools/quant_study.py,
docs/quant_study_r3.json) justifies the attempt: w8a8 MinMax symmetric
quantization costs only −0.005 mIoU / 98% mask agreement on the
19-class fixture set, and the activation-only variant here (bf16
weights) is strictly more accurate than that.

A 1×1 conv over NHWC is exactly a matmul on the flattened
``(N·H·W, Cin)`` view (bitwise-free reshape, C minor), so the kernel is
a grid over row-blocks: each step DMAs a ``(block_m, Cin)`` int8 tile,
dequantizes to bf16 *in VMEM* (exact for |q| ≤ 127), contracts against
the resident effective-weight matrix on the MXU with f32 accumulation,
applies bias + ReLU, and either emits bf16 or requantizes to int8 —
all before anything touches HBM again. Scale folding happens at the
XLA level (callers fold the activation scale s_x — and ÷s_y for int8
output — into the weight/bias), so the epilogue is just
``clip(round(max(acc+b, 0)), ±127)``; quantization semantics match
tools/quant_study.py::fake_quant_array (symmetric, amax/127).

A second variant keeps the weights int8 too and issues the s8×s8→s32
dot (the MXU's native 2× int8 rate) with a per-channel f32 combined
scale in the epilogue — these ops are bandwidth-bound so the MXU rate
is not the point, but it halves the (tiny) weight traffic and tests
whether Mosaic's int8 matmul path is usable here at all.

Reference mapping: the pw halves of reference:models/fast_scnn.py:64-79
(_DSConv), :82-127 (LinearBottleneck expand/project) and :180-212
(FeatureFusion/Classifier convs) — the reference has no quantized path
at all (its Ascend deployment quantizes offline via ATC, outside the
repo); this is a TPU-native addition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "quantize_act",
    "pw_conv_a8",
    "pw_conv_w8a8",
]


def quantize_act(x, scale):
    """Symmetric int8 activation quantization (matches
    tools/quant_study.py: ``clip(round(x/s), -127, 127)``). Plain XLA —
    at a region boundary this is elementwise and fuses into the
    producing op's epilogue."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127.0, 127.0)
    return q.astype(jnp.int8)


def _auto_block_m(k: int, n: int) -> int:
    """Row-block target sized so one grid step's in+out tile is ~2 MB —
    big enough to amortize DMA issue, small enough to double-buffer in
    VMEM (clamped to [256, 8192]). This is the tiling the per-op A/B
    measured its wins with (tools/ab_int8_pw.py, docs/ab_int8_pw_r3.json);
    the serving graph's wiring inherits it via ``block_m=None``."""
    return 1 << max(8, min(13, (2**21 // (k + 2 * n)).bit_length() - 1))


def _pick_block_m(m: int, target: int) -> int:
    """Largest power-of-two divisor of m that is ≤ target and ≥ 32 (the
    int8 sublane tile); 0 if none exists (caller falls back to XLA)."""
    bm = target
    while bm >= 32:
        if m % bm == 0:
            return bm
        bm //= 2
    return 0


def _epilogue(acc, b_row, relu: bool, quantize_out: bool):
    t = acc + b_row  # (bm, n) f32 + (1, n) f32
    if relu:
        t = jnp.maximum(t, 0.0)
    if quantize_out:
        return jnp.clip(jnp.round(t), -127.0, 127.0).astype(jnp.int8)
    return t.astype(jnp.bfloat16)


def _flatten(x_q):
    n, h, w, k = x_q.shape
    return x_q.reshape(n * h * w, k), (n, h, w)


def _xla_a8(x2, w_eff, b_eff, relu, quantize_out):
    acc = jnp.dot(
        x2.astype(jnp.bfloat16),
        w_eff.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return _epilogue(acc, b_eff.astype(jnp.float32)[None, :], relu, quantize_out)


def _xla_w8a8(x2, w_q, cs, b_eff, relu, quantize_out):
    acc = jax.lax.dot_general(
        x2,
        w_q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc = acc.astype(jnp.float32) * cs[None, :]
    return _epilogue(acc, b_eff.astype(jnp.float32)[None, :], relu, quantize_out)


def _pallas_call_pw(kernel, m, n, bm, out_dtype, interpret, x2, *consts):
    from jax.experimental import pallas as pl

    k = x2.shape[1]
    const_specs = [
        pl.BlockSpec(c.shape, (lambda i, nd=c.ndim: (0,) * nd)) for c in consts
    ]
    return pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), (lambda i: (i, 0))),
            *const_specs,
        ],
        out_specs=pl.BlockSpec((bm, n), (lambda i: (i, 0))),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret,
    )(x2, *consts)


@functools.partial(
    jax.jit, static_argnames=("relu", "quantize_out", "use_pallas", "block_m", "interpret")
)
def pw_conv_a8(
    x_q,
    w_eff,
    b_eff,
    *,
    relu: bool = True,
    quantize_out: bool = False,
    use_pallas: bool | None = None,
    block_m: int | None = None,
    interpret: bool = False,
):
    """Pointwise conv on int8 activations with bf16 effective weights.

    ``x_q`` int8 NHWC (or pre-flattened 2-D ``(M, Cin)``); ``w_eff``
    ``(Cin, Cout)`` — the folded conv weight *pre-multiplied by the
    activation scale* (and divided by the output scale when
    ``quantize_out``); ``b_eff`` ``(Cout,)`` — the folded bias (divided
    by the output scale when ``quantize_out``). Returns bf16, or int8
    when ``quantize_out`` (symmetric, zero-point 0 — ReLU is exact in
    the quantized domain).
    """
    squeeze = x_q.ndim == 4
    x2, spatial = _flatten(x_q) if squeeze else (x_q, None)
    m, k = x2.shape
    n = w_eff.shape[1]
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    bm = _pick_block_m(m, block_m if block_m is not None else _auto_block_m(k, n))
    if not (use_pallas or interpret) or bm == 0:
        out = _xla_a8(x2, w_eff, b_eff, relu, quantize_out)
    else:
        wv = w_eff.astype(jnp.bfloat16)
        bv = b_eff.astype(jnp.float32).reshape(1, n)

        def kernel(x_ref, w_ref, b_ref, o_ref):
            acc = jnp.dot(
                x_ref[:].astype(jnp.bfloat16),
                w_ref[:],
                preferred_element_type=jnp.float32,
            )
            o_ref[:] = _epilogue(acc, b_ref[:], relu, quantize_out)

        out_dtype = jnp.int8 if quantize_out else jnp.bfloat16
        out = _pallas_call_pw(kernel, m, n, bm, out_dtype, interpret, x2, wv, bv)
    if squeeze:
        nn, hh, ww = spatial
        out = out.reshape(nn, hh, ww, n)
    return out


@functools.partial(
    jax.jit, static_argnames=("relu", "quantize_out", "use_pallas", "block_m", "interpret")
)
def pw_conv_w8a8(
    x_q,
    w_q,
    cs,
    b_eff,
    *,
    relu: bool = True,
    quantize_out: bool = False,
    use_pallas: bool | None = None,
    block_m: int | None = None,
    interpret: bool = False,
):
    """Pointwise conv with BOTH operands int8 (native MXU s8×s8→s32 dot).

    ``cs`` ``(Cout,)`` f32 — the combined per-channel scale
    ``s_x · s_w[c]`` (÷ ``s_y`` when ``quantize_out``); ``b_eff`` as in
    :func:`pw_conv_a8`.
    """
    squeeze = x_q.ndim == 4
    x2, spatial = _flatten(x_q) if squeeze else (x_q, None)
    m, k = x2.shape
    n = w_q.shape[1]
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    bm = _pick_block_m(m, block_m if block_m is not None else _auto_block_m(k, n))
    if not (use_pallas or interpret) or bm == 0:
        out = _xla_w8a8(x2, w_q, cs, b_eff, relu, quantize_out)
    else:
        csv = cs.astype(jnp.float32).reshape(1, n)
        bv = b_eff.astype(jnp.float32).reshape(1, n)

        def kernel(x_ref, w_ref, cs_ref, b_ref, o_ref):
            acc = jax.lax.dot_general(
                x_ref[:],
                w_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = acc.astype(jnp.float32) * cs_ref[:]
            o_ref[:] = _epilogue(acc, b_ref[:], relu, quantize_out)

        out_dtype = jnp.int8 if quantize_out else jnp.bfloat16
        out = _pallas_call_pw(kernel, m, n, bm, out_dtype, interpret, x2, w_q, csv, bv)
    if squeeze:
        nn, hh, ww = spatial
        out = out.reshape(nn, hh, ww, n)
    return out
