"""Tests for the fused int8 pointwise-conv Pallas kernels (ops/pallas/int8_pw).

Pins: (1) the XLA fallback against a numpy f32 reference, (2) the actual
Pallas kernel bodies (interpret mode on CPU) against the fallback,
(3) quantization semantics against tools/quant_study.py's fake-quant
(the accuracy study's value grid IS the contract — the kernel must see
the same numbers the study validated), (4) TPU-target Mosaic lowering
without hardware, (5) the whole-layer scale-folding recipe vs the
study's value-level simulation.

Reference mapping: reference:models/fast_scnn.py:64-79 pw halves (the
reference has no quantized path; this is a TPU-native addition justified
by docs/quant_study_r3.json).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastscnn_tpu.ops.pallas.int8_pw import (
    _pick_block_m,
    pw_conv_a8,
    pw_conv_w8a8,
    quantize_act,
)
from fastscnn_tpu.tools.quant_study import fake_quant_array


def _np_ref_a8(x_q, w_eff, b_eff, relu, quantize_out):
    """f32 value-level reference for pw_conv_a8 (bf16 rounding excluded —
    tolerances below absorb it)."""
    t = x_q.astype(np.float32) @ w_eff.astype(np.float32) + b_eff.astype(np.float32)
    if relu:
        t = np.maximum(t, 0.0)
    if quantize_out:
        return np.clip(np.round(t), -127, 127).astype(np.int8)
    return t


def test_quantize_act_matches_study_semantics(rng):
    """quantize_act must produce exactly the int8 grid the accuracy study
    simulated: clip(round(x/s), ±127) with s = amax/127."""
    x = rng.normal(0, 2.0, (64, 32)).astype(np.float32)
    s = float(np.max(np.abs(x))) / 127.0
    q = np.asarray(quantize_act(jnp.asarray(x), s))
    assert q.dtype == np.int8
    expect = np.clip(np.round(x / s), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(q, expect)
    # round-trip q*s is exactly the study's ActQuantHook dequant value
    sim = fake_quant_array(x, per_channel=False)
    np.testing.assert_allclose(q.astype(np.float32) * s, sim, rtol=0, atol=1e-6)


@pytest.mark.parametrize("relu", [True, False])
@pytest.mark.parametrize("quantize_out", [True, False])
def test_pw_conv_a8_xla_matches_reference(rng, relu, quantize_out):
    m, k, n = 96, 32, 48
    x_q = rng.integers(-127, 128, (m, k)).astype(np.int8)
    w = rng.normal(0, 0.05, (k, n)).astype(np.float32)
    b = rng.normal(0, 0.1, (n,)).astype(np.float32)
    got = np.asarray(
        pw_conv_a8(
            jnp.asarray(x_q), jnp.asarray(w), jnp.asarray(b),
            relu=relu, quantize_out=quantize_out, use_pallas=False,
        )
    )
    ref = _np_ref_a8(x_q, w, b, relu, quantize_out)
    if quantize_out:
        # bf16 rounding can flip a borderline round(); allow off-by-one
        # on a small fraction of entries
        diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1 and (diff > 0).mean() < 0.05
    else:
        np.testing.assert_allclose(got.astype(np.float32), ref, rtol=2e-2, atol=0.25)


@pytest.mark.parametrize("quantize_out", [True, False])
def test_pw_conv_a8_pallas_interpret_matches_xla(rng, quantize_out):
    """The actual kernel body (interpreter) == the XLA fallback, bitwise:
    both compute bf16×bf16→f32 then the identical epilogue."""
    m, k, n = 128, 64, 48  # bm=128 divides m → kernel path taken
    x_q = rng.integers(-127, 128, (m, k)).astype(np.int8)
    w = rng.normal(0, 0.05, (k, n)).astype(np.float32)
    b = rng.normal(0, 0.1, (n,)).astype(np.float32)
    xa, wa, ba = jnp.asarray(x_q), jnp.asarray(w), jnp.asarray(b)
    ker = np.asarray(
        pw_conv_a8(xa, wa, ba, quantize_out=quantize_out, interpret=True, block_m=64)
    )
    xla = np.asarray(pw_conv_a8(xa, wa, ba, quantize_out=quantize_out, use_pallas=False))
    np.testing.assert_array_equal(ker, xla)


@pytest.mark.parametrize("quantize_out", [True, False])
def test_pw_conv_w8a8_pallas_interpret_matches_xla(rng, quantize_out):
    m, k, n = 128, 48, 64
    x_q = rng.integers(-127, 128, (m, k)).astype(np.int8)
    w_q = rng.integers(-127, 128, (k, n)).astype(np.int8)
    cs = rng.uniform(1e-4, 1e-2, (n,)).astype(np.float32)
    b = rng.normal(0, 0.1, (n,)).astype(np.float32)
    xa, wa, ca, ba = jnp.asarray(x_q), jnp.asarray(w_q), jnp.asarray(cs), jnp.asarray(b)
    ker = np.asarray(
        pw_conv_w8a8(xa, wa, ca, ba, quantize_out=quantize_out, interpret=True, block_m=32)
    )
    xla = np.asarray(
        pw_conv_w8a8(xa, wa, ca, ba, quantize_out=quantize_out, use_pallas=False)
    )
    np.testing.assert_array_equal(ker, xla)


def test_pw_conv_4d_nhwc_and_fallback_on_odd_m(rng):
    """NHWC in/out round-trips the flatten, and an M with no power-of-two
    block divisor ≥32 silently uses the (correct) XLA path."""
    x_q = rng.integers(-127, 128, (2, 6, 5, 16)).astype(np.int8)  # M=60 → bm=0
    assert _pick_block_m(60, 1024) == 0
    w = rng.normal(0, 0.05, (16, 24)).astype(np.float32)
    b = rng.normal(0, 0.1, (24,)).astype(np.float32)
    out = pw_conv_a8(jnp.asarray(x_q), jnp.asarray(w), jnp.asarray(b), use_pallas=True)
    assert out.shape == (2, 6, 5, 24) and out.dtype == jnp.bfloat16
    ref = _np_ref_a8(x_q.reshape(60, 16), w, b, True, False).reshape(2, 6, 5, 24)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=2e-2, atol=0.25)


def test_pick_block_m():
    assert _pick_block_m(4096, 1024) == 1024
    assert _pick_block_m(1536, 1024) == 512
    assert _pick_block_m(96, 1024) == 32
    assert _pick_block_m(60, 1024) == 0
    assert _pick_block_m(31, 1024) == 0


def test_int8_kernels_lower_for_tpu_target():
    """Cross-platform Mosaic lowering (same offline compile-safety gate as
    the other Pallas kernels): int8 VMEM tiles, the s8×s8→s32 MXU dot,
    and the int8-output epilogue must all be Mosaic-legal before any
    hardware A/B."""
    m, k, n = 4096, 64, 384
    xs = jax.ShapeDtypeStruct((m, k), jnp.int8)
    w = jnp.zeros((k, n), jnp.bfloat16)
    wq = jnp.zeros((k, n), jnp.int8)
    cs = jnp.ones((n,), jnp.float32)
    b = jnp.zeros((n,), jnp.float32)
    for fn in (
        lambda x: pw_conv_a8(x, w, b, use_pallas=True),
        lambda x: pw_conv_a8(x, w, b, quantize_out=True, use_pallas=True),
        lambda x: pw_conv_w8a8(x, wq, cs, b, use_pallas=True),
        lambda x: pw_conv_w8a8(x, wq, cs, b, quantize_out=True, use_pallas=True),
    ):
        jax.export.export(jax.jit(fn), platforms=["tpu"])(xs)


def test_layer_recipe_matches_quant_study_simulation(rng):
    """The deployment recipe — fold s_x into the weights, feed int8
    activations — must reproduce the VALUE-level simulation the accuracy
    study validated (ActQuantHook dequant + bf16 conv) to bf16 rounding.
    This is the link that lets docs/quant_study_r3.json's accuracy table
    stand in for the kernel's accuracy."""
    m, k, n = 64, 32, 48
    x = rng.normal(0, 1.5, (m, k)).astype(np.float32)
    w = fake_quant_array(rng.normal(0, 0.05, (k, n)).astype(np.float32), per_channel=True)
    b = rng.normal(0, 0.1, (n,)).astype(np.float32)
    s_x = float(np.max(np.abs(x))) / 127.0

    # study simulation: dequantized activations through the bf16 graph
    x_dq = (np.clip(np.round(x / s_x), -127, 127) * s_x).astype(np.float32)
    sim = np.maximum(x_dq @ w + b, 0.0)

    # kernel recipe: int8 activations, scale folded into the weight
    q = quantize_act(jnp.asarray(x), s_x)
    got = np.asarray(
        pw_conv_a8(q, jnp.asarray(w * s_x), jnp.asarray(b), interpret=True, block_m=32),
        np.float32,
    )
    np.testing.assert_allclose(got, sim, rtol=2e-2, atol=0.25)

    # and the w8a8 variant with the combined per-channel scale
    amax_w = np.max(np.abs(w), axis=0)
    s_w = np.where(amax_w > 0, amax_w / 127.0, 1.0).astype(np.float32)
    w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
    got2 = np.asarray(
        pw_conv_w8a8(
            q, jnp.asarray(w_q), jnp.asarray(s_x * s_w), jnp.asarray(b),
            interpret=True, block_m=32,
        ),
        np.float32,
    )
    # w_q*s_w == w exactly (w is already on the int8 grid), so the only
    # difference vs sim is accumulation precision (int32 exact vs bf16)
    np.testing.assert_allclose(got2, sim, rtol=2e-2, atol=0.25)
