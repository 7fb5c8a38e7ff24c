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


def test_auto_block_m_matches_measured_tiling():
    """block_m=None reproduces the tiling docs/ab_int8_pw_r3.json was
    measured with (~2 MB in+out per grid step, clamped to [256, 8192])."""
    from fastscnn_tpu.ops.pallas.int8_pw import _auto_block_m

    assert _auto_block_m(32, 48) == 8192  # ds1-pw
    assert _auto_block_m(64, 384) == 2048  # b1.1-expand
    assert _auto_block_m(128, 128) == 4096  # ffm-low / cls
    assert _auto_block_m(384, 64) == 4096  # b1.1-project
    assert _auto_block_m(10_000, 10_000) == 256  # clamp low
    assert _auto_block_m(1, 1) == 8192  # clamp high


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


# ---------------------------------------------------------------------------
# Serving-graph wiring: folded_pw_impl='int8-a8'/'int8-w8a8' + calibration
# ---------------------------------------------------------------------------


class _SiteFakeQuant:
    """Value-level simulation hook: int8 quant-dequant at exactly the
    given sites (what the accuracy study validated, keyed by site)."""

    def __init__(self, scales):
        self.scales = dict(scales)

    def __call__(self, y, site=None):
        s = self.scales.get(site)
        if s is None:
            return y
        q = jnp.clip(jnp.round(y.astype(jnp.float32) / s), -127, 127)
        return (q * s).astype(y.dtype)


def _small_folded(rng, num_classes=3):
    from fastscnn_tpu.models import FastSCNN, fold_inference_params, init_fast_scnn

    model = FastSCNN(num_classes=num_classes)
    params, state = init_fast_scnn(jax.random.PRNGKey(5), num_classes)
    folded = fold_inference_params(params, state, dtype=jnp.bfloat16)
    return model, folded


def test_calibrate_pw_scales_covers_all_sites(rng):
    from fastscnn_tpu.models import PW_INT8_SITES, calibrate_pw_scales

    model, folded = _small_folded(rng)
    batches = [rng.normal(0, 1, (1, 64, 96, 3)).astype(np.float32) for _ in range(2)]
    scales = calibrate_pw_scales(model, folded, batches)
    assert {k for k, _ in scales} == set(PW_INT8_SITES)
    assert all(s > 0 for _, s in scales)
    # deterministic + hashable (usable in jit cache keys via the model)
    assert scales == calibrate_pw_scales(model, folded, batches)
    hash(scales)


def test_quantized_model_matches_fakequant_simulation(rng):
    """int8-a8 apply_folded == the site-keyed fake-quant simulation (the
    grid the accuracy study validated) up to bf16 weight-fold rounding:
    logits close, masks in near-total agreement."""
    import dataclasses as dc

    from fastscnn_tpu.models import calibrate_pw_scales, quantized_model

    model, folded = _small_folded(rng)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 96, 3)), jnp.bfloat16)
    scales = calibrate_pw_scales(model, folded, [x])

    qmodel = quantized_model(model, scales)  # XLA fallback on CPU
    got = qmodel.apply_folded(folded, x, upsample_outputs=False)[0]

    sim_model = dc.replace(model, act_fake_quant=_SiteFakeQuant(scales))
    sim = sim_model.apply_folded(folded, x, upsample_outputs=False)[0]

    got32, sim32 = np.asarray(got, np.float32), np.asarray(sim, np.float32)
    scale = max(1.0, float(np.abs(sim32).max()))
    assert np.abs(got32 - sim32).max() / scale < 0.08
    mask_agree = (got32.argmax(-1) == sim32.argmax(-1)).mean()
    assert mask_agree > 0.98, f"mask agreement {mask_agree:.4f}"


def test_quantized_model_w8a8_close_to_a8(rng):
    from fastscnn_tpu.models import calibrate_pw_scales, quantized_model

    model, folded = _small_folded(rng)
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 96, 3)), jnp.bfloat16)
    scales = calibrate_pw_scales(model, folded, [x])
    a8 = quantized_model(model, scales).apply_folded(folded, x, upsample_outputs=False)[0]
    w8 = quantized_model(model, scales, impl="int8-w8a8").apply_folded(
        folded, x, upsample_outputs=False
    )[0]
    a, b = np.asarray(a8, np.float32), np.asarray(w8, np.float32)
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree > 0.97, f"a8 vs w8a8 mask agreement {agree:.4f}"


def test_quantized_serving_graph_lowers_for_tpu_target(rng):
    """Whole int8 serving graph (Pallas kernels forced) lowers through
    Mosaic for the TPU target — the offline compile-safety gate."""
    from fastscnn_tpu.models import calibrate_pw_scales, quantized_model

    model, folded = _small_folded(rng)
    calib = jnp.asarray(rng.normal(0, 1, (1, 64, 128, 3)), jnp.bfloat16)
    scales = calibrate_pw_scales(model, folded, [calib])
    for impl in ("int8-a8", "int8-w8a8"):
        qmodel = quantized_model(model, scales, impl=impl, use_pallas=True)
        fn = lambda x: qmodel.apply_folded(folded, x, upsample_outputs=False)[0]
        jax.export.export(jax.jit(fn), platforms=["tpu"])(
            jax.ShapeDtypeStruct((1, 256, 512, 3), jnp.bfloat16)
        )


def test_calibrate_rejects_unreached_sites(rng):
    from fastscnn_tpu.models import calibrate_pw_scales

    model, folded = _small_folded(rng)
    x = rng.normal(0, 1, (1, 64, 96, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="never reached"):
        calibrate_pw_scales(model, folded, [x], sites=("not/a/site",))


def test_quantized_model_rejects_unknown_impl(rng):
    from fastscnn_tpu.models import quantized_model

    model, _ = _small_folded(rng)
    with pytest.raises(ValueError, match="unknown int8 pw impl"):
        quantized_model(model, (), impl="int4")
