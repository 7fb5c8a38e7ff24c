"""Ops parity tests: bilinear resize and adaptive pooling vs PyTorch."""

import numpy as np
import pytest

import jax.numpy as jnp

from fastscnn_tpu.ops import adaptive_avg_pool, avg_pool, resize_bilinear, resize_nearest
from tests.conftest import requires_torch


@requires_torch
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((4, 4), (8, 8)),
        ((1, 1), (7, 5)),
        ((2, 3), (32, 48)),
        ((16, 32), (128, 256)),
        ((13, 17), (7, 5)),  # downsample
        ((24, 24), (24, 24)),  # identity
    ],
)
@pytest.mark.parametrize("align_corners", [True, False])
def test_resize_bilinear_matches_torch(rng, in_hw, out_hw, align_corners):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align_corners))
    theirs = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_hw,
            mode="bilinear",
            align_corners=align_corners,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@requires_torch
@pytest.mark.parametrize("in_hw", [(32, 64), (33, 65), (7, 11), (6, 6)])
@pytest.mark.parametrize("out_size", [1, 2, 3, 6])
def test_adaptive_avg_pool_matches_torch(rng, in_hw, out_size):
    import torch

    x = rng.standard_normal((2, *in_hw, 5), dtype=np.float32)
    ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), out_size))
    theirs = (
        torch.nn.AdaptiveAvgPool2d(out_size)(torch.from_numpy(x).permute(0, 3, 1, 2))
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


@requires_torch
def test_fixed_avg_pool_matches_torch(rng):
    import torch

    x = rng.standard_normal((1, 32, 32, 4), dtype=np.float32)
    for window in (32, 16, 8, 4):
        ours = np.asarray(avg_pool(jnp.asarray(x), window))
        theirs = (
            torch.nn.AvgPool2d(window, window)(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_resize_nearest_matches_cv2_shape(rng):
    x = (rng.random((1, 12, 18, 1)) * 255).astype(np.float32)
    out = np.asarray(resize_nearest(jnp.asarray(x), (36, 54)))
    assert out.shape == (1, 36, 54, 1)
    # Nearest must only contain values from the input
    assert set(np.unique(out)).issubset(set(np.unique(x)))


@requires_torch
def test_resize_nearest_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((1, 9, 13, 2), dtype=np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), (27, 31)))
    theirs = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(27, 31), mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs)


@requires_torch
def test_resize_fuzz_sweep(rng):
    """Broad random shape sweep locking in PyTorch-exact resize semantics."""
    import torch
    import torch.nn.functional as F

    for trial in range(25):
        in_h = int(rng.integers(1, 40))
        in_w = int(rng.integers(1, 40))
        out_h = int(rng.integers(1, 70))
        out_w = int(rng.integers(1, 70))
        align = bool(rng.integers(0, 2))
        x = rng.standard_normal((1, in_h, in_w, 2), dtype=np.float32)
        ours = np.asarray(
            resize_bilinear(jnp.asarray(x), (out_h, out_w), align_corners=align)
        )
        theirs = (
            F.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2),
                size=(out_h, out_w),
                mode="bilinear",
                align_corners=align,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(
            ours, theirs, rtol=1e-4, atol=1e-5,
            err_msg=f"trial {trial}: {in_h}x{in_w}->{out_h}x{out_w} align={align}",
        )


@requires_torch
def test_adaptive_pool_fuzz_sweep(rng):
    import torch

    for trial in range(25):
        in_h = int(rng.integers(1, 50))
        in_w = int(rng.integers(1, 50))
        out_h = int(rng.integers(1, min(in_h, 9) + 1))
        out_w = int(rng.integers(1, min(in_w, 9) + 1))
        x = rng.standard_normal((1, in_h, in_w, 3), dtype=np.float32)
        ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), (out_h, out_w)))
        theirs = (
            torch.nn.AdaptiveAvgPool2d((out_h, out_w))(
                torch.from_numpy(x).permute(0, 3, 1, 2)
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(
            ours, theirs, rtol=1e-5, atol=1e-6,
            err_msg=f"trial {trial}: {in_h}x{in_w}->{out_h}x{out_w}",
        )


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((16, 32), (128, 256)), ((128, 256), (16, 32)), ((7, 5), (23, 31)), ((4, 4), (4, 4))],
)
def test_resize_bilinear_matmul_matches_gather(rng, in_hw, out_hw, align_corners):
    """The MXU interp-matmul formulation must reproduce the two-tap
    gather path (identical weights; only summation order differs)."""
    from fastscnn_tpu.ops.resize import resize_bilinear_matmul

    x = jnp.asarray(rng.standard_normal((2, *in_hw, 19)).astype(np.float32))
    want = resize_bilinear(x, out_hw, align_corners=align_corners)
    got = resize_bilinear_matmul(x, out_hw, align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    # channel-free 3-D form
    x3 = x[..., 0]
    want3 = resize_bilinear(x3, out_hw, align_corners=align_corners)
    got3 = resize_bilinear_matmul(x3, out_hw, align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want3), rtol=1e-5, atol=1e-5)


def test_engine_final_upsample_matmul_matches_gather(rng):
    """Serving masks must agree between the 'matmul' and 'gather'
    final-upsample formulations (flips possible only at exact bf16
    ties; none expected on random weights)."""
    import jax

    from fastscnn_tpu.engine import E2EConfig, InferenceEngine
    from fastscnn_tpu.models import FastSCNN, init_fast_scnn

    model = FastSCNN(num_classes=7)
    params, state = init_fast_scnn(jax.random.PRNGKey(0), 7)
    x = rng.integers(0, 256, (2, 64, 128, 3)).astype(np.uint8)
    masks = {}
    for mode in ("matmul", "gather", "pallas", "hybrid", "hybrid-pallas"):
        eng = InferenceEngine(
            model, params, state,
            config=E2EConfig(compute_dtype="float32", final_upsample=mode),
        )
        masks[mode] = eng.predict(x)
    for mode in ("gather", "pallas", "hybrid", "hybrid-pallas"):
        diff = np.mean(masks["matmul"] != masks[mode])
        assert diff < 1e-3, f"mask diff {diff:.2%} matmul vs {mode}"


def test_engine_argmax_first_mode(rng):
    """'argmax-first' (opt-in fast mode) must produce a full-res mask that
    agrees with the exact path away from class boundaries."""
    import jax

    from fastscnn_tpu.engine import E2EConfig, InferenceEngine
    from fastscnn_tpu.models import FastSCNN, init_fast_scnn

    model = FastSCNN(num_classes=7)
    params, state = init_fast_scnn(jax.random.PRNGKey(0), 7)
    x = rng.integers(0, 256, (2, 64, 128, 3)).astype(np.uint8)
    exact = InferenceEngine(
        model, params, state, config=E2EConfig(compute_dtype="float32")
    ).predict(x)
    fast = InferenceEngine(
        model, params, state,
        config=E2EConfig(compute_dtype="float32", final_upsample="argmax-first"),
    ).predict(x)
    assert fast.shape == exact.shape
    # nearest-expanded 1/8 argmax: identical inside regions, differs only
    # near boundaries — random-init logits are smooth enough for >60%
    agreement = np.mean(fast == exact)
    assert agreement > 0.6, f"agreement {agreement:.2%}"


def test_packed_argmax_exact_including_ties(rng):
    """packed_argmax (a measured-rejected serving optimization, kept as a
    documented experiment) must agree with jnp.argmax EXACTLY, including
    first-occurrence tie-breaking, for bf16 inputs with C <= 256."""
    import jax.numpy as jnp

    from fastscnn_tpu.ops.pallas.upsample_argmax import packed_argmax

    y = jnp.asarray(rng.standard_normal((3, 11, 7, 19)), jnp.bfloat16)
    # Force exact ties (bf16 rounding makes duplicates likely anyway, but
    # make them certain): copy channel 4 into channels 9 and 14.
    y = y.at[..., 9].set(y[..., 4]).at[..., 14].set(y[..., 4])
    for axis in range(4):
        ref = np.asarray(jnp.argmax(y, axis=axis))
        got = np.asarray(packed_argmax(y, axis=axis))
        np.testing.assert_array_equal(ref, got)
    # uint8 output dtype and the non-bf16 fallback
    assert packed_argmax(y, axis=-1, out_dtype=jnp.uint8).dtype == jnp.uint8
    yf = y.astype(jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(packed_argmax(yf, axis=-1)), np.asarray(jnp.argmax(yf, axis=-1))
    )


def test_engine_mask_dtype_uint8(rng):
    """mask_dtype='uint8' must give the identical mask as int32, born
    uint8 inside the fused graph (no host-side conversion)."""
    import jax

    from fastscnn_tpu.engine import E2EConfig, InferenceEngine
    from fastscnn_tpu.models import FastSCNN, init_fast_scnn

    model = FastSCNN(num_classes=7)
    params, state = init_fast_scnn(jax.random.PRNGKey(0), 7)
    x = rng.integers(0, 256, (2, 64, 128, 3)).astype(np.uint8)
    m32 = InferenceEngine(
        model, params, state, config=E2EConfig(compute_dtype="float32")
    ).predict(x)
    m8 = InferenceEngine(
        model, params, state,
        config=E2EConfig(compute_dtype="float32", mask_dtype="uint8"),
    ).predict(x)
    assert np.asarray(m8).dtype == np.uint8
    np.testing.assert_array_equal(np.asarray(m32), np.asarray(m8))
