"""On-device augmentation (data/device_aug.py) vs the PIL reference chain.

The PIL path (data/transforms.py) stays the default and keeps its
pixel-parity gate against the reference loaders; device aug is the
opt-in TPU formulation with documented divergences (exact-rational
NEAREST at PIL's float-accumulation tie rows; true Gaussian vs PIL's
3-pass box blur). These tests gate:

  * image parity with PIL given injected params (no blur: PIL's own
    uint8/fixed-point quantization is the only difference),
  * blurred-image closeness (loose bound; different blur algorithms),
  * exact mask equality vs an independent numpy rational-NEAREST
    reference, and high statistical agreement with PIL,
  * reference-matching draw distributions (inclusive randint bounds),
  * jit + dp-mesh compatibility of the augment inside the train step.

Reference semantics under test: reference:data_loader/cityscapes.py:115-150.
"""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image, ImageFilter, ImageOps

from fastscnn_tpu.data.device_aug import (
    AugParams,
    apply_params,
    draw_params,
    make_device_augment,
)

H, W, CROP, BASE = 96, 192, 64, 96
PAD = -1


def _fixture_pair(seed=0):
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.stack([(yy * 2 + xx) % 256, (xx * 1.3) % 256, (yy * 2.7) % 256], -1).astype(np.uint8)
    mask = ((yy // 7 + xx // 9) % 20 - 1).astype(np.int32)
    return img, mask


def _pil_apply(img_arr, mask_arr, flip, short, y1, x1, blur_on, radius, crop=CROP, pad_label=PAD):
    """The reference chain (transforms.py train path) with injected params,
    run on the already-label-transformed mask (NEAREST + pad commute with
    the remap when pad_label = transform(0))."""
    img = Image.fromarray(img_arr)
    mask = Image.fromarray(mask_arr.astype(np.int32), mode="I")
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
        mask = mask.transpose(Image.FLIP_LEFT_RIGHT)
    w, h = img.size
    if h > w:
        ow = short
        oh = int(1.0 * h * ow / w)
    else:
        oh = short
        ow = int(1.0 * w * oh / h)
    img = img.resize((ow, oh), Image.BILINEAR)
    mask = mask.resize((ow, oh), Image.NEAREST)
    if short < crop:
        padh = crop - oh if oh < crop else 0
        padw = crop - ow if ow < crop else 0
        img = ImageOps.expand(img, border=(0, 0, padw, padh), fill=0)
        mask = ImageOps.expand(mask, border=(0, 0, padw, padh), fill=pad_label)
    img = img.crop((x1, y1, x1 + crop, y1 + crop))
    mask = mask.crop((x1, y1, x1 + crop, y1 + crop))
    if blur_on:
        img = img.filter(ImageFilter.GaussianBlur(radius=radius))
    return np.asarray(img, np.float32), np.asarray(mask, np.int32)


def _numpy_nearest_reference(mask_arr, flip, short, y1, x1, crop=CROP, pad_label=PAD):
    """Independent exact-rational NEAREST implementation (numpy ints)."""
    m = mask_arr[:, ::-1] if flip else mask_arr
    h, w = m.shape
    if h > w:
        ow = short
        oh = (h * ow) // w
    else:
        oh = short
        ow = (w * oh) // h
    out = np.full((crop, crop), pad_label, np.int32)
    gi = y1 + np.arange(crop)
    gj = x1 + np.arange(crop)
    vi = gi < oh
    vj = gj < ow
    si = np.clip(((2 * gi + 1) * h) // (2 * oh), 0, h - 1)
    sj = np.clip(((2 * gj + 1) * w) // (2 * ow), 0, w - 1)
    sub = m[np.ix_(si[vi], sj[vj])]
    out[np.ix_(vi, vj)] = sub
    return out


def _random_params(rng):
    flip = bool(rng.integers(0, 2))
    short = int(rng.integers(BASE // 2, BASE * 2 + 1))
    if H > W:
        ow = short
        oh = (H * ow) // W
    else:
        oh = short
        ow = (W * oh) // H
    ph, pw = max(oh, CROP), max(ow, CROP)
    y1 = int(rng.integers(0, ph - CROP + 1))
    x1 = int(rng.integers(0, pw - CROP + 1))
    return flip, short, y1, x1


def _device_apply(img, mask, flip, short, y1, x1, blur_on, radius, compute_dtype=jnp.float32):
    p = AugParams(
        jnp.array([flip]),
        jnp.array([short], jnp.int32),
        jnp.array([y1], jnp.int32),
        jnp.array([x1], jnp.int32),
        jnp.array([blur_on]),
        jnp.array([radius], jnp.float32),
    )
    di, dm = apply_params(
        jnp.asarray(img)[None],
        jnp.asarray(mask)[None],
        p,
        crop_size=CROP,
        base_size=BASE,
        pad_label=PAD,
        compute_dtype=compute_dtype,
    )
    return np.asarray(di[0]), np.asarray(dm[0])


def test_image_matches_pil_no_blur():
    img, mask = _fixture_pair()
    rng = np.random.default_rng(1)
    for _ in range(8):
        flip, short, y1, x1 = _random_params(rng)
        ref_img, _ = _pil_apply(img, mask, flip, short, y1, x1, False, 0.0)
        di, _ = _device_apply(img, mask, flip, short, y1, x1, False, 0.0)
        # PIL quantizes to uint8 with fixed-point coefficients; we stay float.
        assert np.abs(di - ref_img).max() <= 2.5, (flip, short, y1, x1)
        assert np.abs(di - ref_img).mean() <= 0.6


def test_image_close_to_pil_with_blur():
    img, mask = _fixture_pair()
    rng = np.random.default_rng(2)
    for _ in range(6):
        flip, short, y1, x1 = _random_params(rng)
        radius = float(rng.random())
        ref_img, _ = _pil_apply(img, mask, flip, short, y1, x1, True, radius)
        di, _ = _device_apply(img, mask, flip, short, y1, x1, True, radius)
        # True Gaussian vs PIL's 3-pass box approximation.
        assert np.abs(di - ref_img).max() <= 14.0, (flip, short, y1, x1, radius)
        assert np.abs(di - ref_img).mean() <= 1.2


def test_bf16_compute_path_stays_close():
    img, mask = _fixture_pair()
    flip, short, y1, x1 = _random_params(np.random.default_rng(3))
    ref_img, _ = _pil_apply(img, mask, flip, short, y1, x1, False, 0.0)
    di, dm = _device_apply(img, mask, flip, short, y1, x1, False, 0.0, compute_dtype=jnp.bfloat16)
    assert np.abs(di - ref_img).max() <= 6.0
    # the mask path must stay exact regardless of compute dtype
    assert (dm == _numpy_nearest_reference(mask, flip, short, y1, x1)).all()


def test_mask_exact_vs_rational_reference_and_close_to_pil():
    img, mask = _fixture_pair()
    rng = np.random.default_rng(4)
    agrees = []
    for _ in range(10):
        flip, short, y1, x1 = _random_params(rng)
        _, ref_mask = _pil_apply(img, mask, flip, short, y1, x1, False, 0.0)
        _, dm = _device_apply(img, mask, flip, short, y1, x1, False, 0.0)
        assert (dm == _numpy_nearest_reference(mask, flip, short, y1, x1)).all()
        agrees.append((dm == ref_mask).mean())
    # PIL's incremental-float NEAREST differs only at exact tie rows.
    assert np.mean(agrees) >= 0.97
    assert min(agrees) >= 0.9


def test_pad_region_gets_pad_label_and_zero_image():
    img, mask = _fixture_pair()
    short = BASE // 2  # oh < crop for this geometry → bottom pad
    oh = short  # H < W in the fixture, so the short edge is H
    di, dm = _device_apply(img, mask, False, short, 0, 0, False, 0.0)
    assert oh < CROP
    assert (dm[oh:, :] == PAD).all()
    assert np.abs(di[oh:, :, :]).max() == 0.0
    ref_img, ref_mask = _pil_apply(img, mask, False, short, 0, 0, False, 0.0)
    assert (ref_mask[oh:, :] == PAD).all()


def test_draw_distributions_match_reference():
    key = jax.random.PRNGKey(0)
    p = draw_params(key, 4096, H, W, BASE, CROP)
    short = np.asarray(p.short)
    lo, hi = int(BASE * 0.5), int(BASE * 2.0)
    assert short.min() >= lo and short.max() <= hi
    assert short.min() == lo and short.max() == hi  # inclusive endpoints reachable
    assert abs(np.asarray(p.flip).mean() - 0.5) < 0.05
    assert abs(np.asarray(p.blur_on).mean() - 0.5) < 0.05
    r = np.asarray(p.radius)
    assert r.min() >= 0.0 and r.max() < 1.0
    # crop offsets always inside the padded canvas (H < W in the fixture)
    oh = short
    ow = (W * short) // H
    assert (np.asarray(p.y1) <= np.maximum(oh, CROP) - CROP).all()
    assert (np.asarray(p.x1) <= np.maximum(ow, CROP) - CROP).all()
    assert (np.asarray(p.y1) >= 0).all() and (np.asarray(p.x1) >= 0).all()


def test_train_step_with_device_aug_dp_equivalence():
    """The augmented train step runs on the dp mesh and matches 1-device
    (same rng → same per-sample draws; aug ops are batch-leading)."""
    from fastscnn_tpu.losses import get_loss_fn
    from fastscnn_tpu.models import FastSCNN
    from fastscnn_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_optimizer,
        make_train_step,
    )
    from fastscnn_tpu.utils import lr_schedule

    model = FastSCNN(num_classes=2, aux=True)
    schedule = lr_schedule("poly", base_lr=1e-2, niters=50, power=0.9)
    optimizer = make_optimizer("sgd", schedule)
    aug = make_device_augment(
        base_size=BASE, crop_size=CROP, pad_label=0, compute_dtype=jnp.float32
    )
    loss_fn = get_loss_fn("dice", aux=True)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (8, H, W, 3)).astype(np.uint8)
    masks = ((np.mgrid[0:H, 0:W][0] // 7 + np.mgrid[0:H, 0:W][1] // 9) % 2).astype(np.int32)
    masks = np.stack([masks] * 8)
    images, masks = jnp.asarray(images), jnp.asarray(masks)

    results = []
    for mesh in (None, make_mesh(n_data=8)):
        state = create_train_state(model, optimizer, key=jax.random.PRNGKey(0))
        step = make_train_step(
            model, loss_fn, optimizer, mesh=mesh, device_aug=aug,
            compute_dtype=jnp.float32,
        )
        state, metrics = step(state, images, masks, jax.random.PRNGKey(3))
        results.append((float(metrics["loss"]), state.params))
    assert np.isfinite(results[0][0])
    assert abs(results[0][0] - results[1][0]) < 1e-5
    flat0 = jax.tree_util.tree_leaves(results[0][1])
    flat1 = jax.tree_util.tree_leaves(results[1][1])
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_split_aug_train_step_matches_fused():
    """The two-program split path (make_split_aug_train_step — the
    compile-wall workaround, docs/PERFORMANCE.md bs96 `--device-aug`)
    must match the fused device_aug step at grad_accum=1: same rng →
    same per-sample draws → same loss and updated params. Also checked
    under the dp mesh (the sharded aug program)."""
    from fastscnn_tpu.losses import get_loss_fn
    from fastscnn_tpu.models import FastSCNN
    from fastscnn_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_optimizer,
        make_split_aug_train_step,
        make_train_step,
    )
    from fastscnn_tpu.utils import lr_schedule

    model = FastSCNN(num_classes=2, aux=True)
    optimizer = make_optimizer(
        "sgd", lr_schedule("poly", base_lr=1e-2, niters=50, power=0.9)
    )
    aug = make_device_augment(
        base_size=BASE, crop_size=CROP, pad_label=0, compute_dtype=jnp.float32
    )
    loss_fn = get_loss_fn("dice", aux=True)

    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.integers(0, 256, (8, H, W, 3)).astype(np.uint8))
    masks = jnp.asarray(rng.integers(0, 2, (8, H, W)).astype(np.int32))

    results = []
    for mesh in (None, make_mesh(n_data=8)):
        fused = make_train_step(
            model, loss_fn, optimizer, mesh=mesh, device_aug=aug,
            compute_dtype=jnp.float32,
        )
        split = make_split_aug_train_step(
            model, loss_fn, optimizer, aug, mesh=mesh,
            compute_dtype=jnp.float32, donate=False,
        )
        s_f = create_train_state(model, optimizer, key=jax.random.PRNGKey(0))
        s_s = create_train_state(model, optimizer, key=jax.random.PRNGKey(0))
        s_f, m_f = fused(s_f, images, masks, jax.random.PRNGKey(3))
        s_s, m_s = split(s_s, images, masks, jax.random.PRNGKey(3))
        np.testing.assert_allclose(
            float(m_s["loss"]), float(m_f["loss"]), rtol=1e-6, atol=1e-7
        )
        assert (jax.tree_util.tree_structure(s_s.params)
                == jax.tree_util.tree_structure(s_f.params))
        for a, b in zip(
            jax.tree_util.tree_leaves(s_s.params),
            jax.tree_util.tree_leaves(s_f.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
            )
        results.append(float(m_s["loss"]))
    # and the mesh run equals the single-device run
    assert abs(results[0] - results[1]) < 1e-5


def test_split_aug_with_grad_accum_runs_on_mesh():
    """grad_accum>1 under the split path: the aug draws once for the
    whole batch (documented divergence from the fused path's
    per-microbatch re-draw — same distribution, different stream); the
    step must run on the dp mesh and produce a finite loss with the
    step counter advancing."""
    from fastscnn_tpu.losses import get_loss_fn
    from fastscnn_tpu.models import FastSCNN
    from fastscnn_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_optimizer,
        make_split_aug_train_step,
    )
    from fastscnn_tpu.utils import lr_schedule

    model = FastSCNN(num_classes=2, aux=True)
    optimizer = make_optimizer(
        "sgd", lr_schedule("poly", base_lr=1e-2, niters=50, power=0.9)
    )
    aug = make_device_augment(
        base_size=BASE, crop_size=CROP, pad_label=0, compute_dtype=jnp.float32
    )
    split = make_split_aug_train_step(
        model, get_loss_fn("dice", aux=True), optimizer, aug,
        mesh=make_mesh(n_data=4), compute_dtype=jnp.float32,
        grad_accum=2, donate=False,
    )
    rng = np.random.default_rng(3)
    # batch = grad_accum × n_data so each microbatch shards evenly
    images = jnp.asarray(rng.integers(0, 256, (8, H, W, 3)).astype(np.uint8))
    masks = jnp.asarray(rng.integers(0, 2, (8, H, W)).astype(np.int8))  # i8 wire
    state = create_train_state(model, optimizer, key=jax.random.PRNGKey(0))
    state, metrics = split(state, images, masks, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_split_aug_rejects_spatial_shard():
    from fastscnn_tpu.losses import get_loss_fn
    from fastscnn_tpu.models import FastSCNN
    from fastscnn_tpu.parallel import (
        make_mesh,
        make_optimizer,
        make_split_aug_train_step,
    )
    from fastscnn_tpu.utils import lr_schedule

    model = FastSCNN(num_classes=2)
    optimizer = make_optimizer(
        "sgd", lr_schedule("poly", base_lr=1e-2, niters=10, power=0.9)
    )
    aug = make_device_augment(base_size=BASE, crop_size=CROP, pad_label=0)
    with pytest.raises(ValueError, match="spatial"):
        make_split_aug_train_step(
            model, get_loss_fn("dice"), optimizer, aug,
            mesh=make_mesh(n_data=4, n_space=2),
        )


def test_device_aug_rejects_spatial_shard():
    from fastscnn_tpu.losses import get_loss_fn
    from fastscnn_tpu.models import FastSCNN
    from fastscnn_tpu.parallel import make_mesh, make_optimizer, make_train_step
    from fastscnn_tpu.utils import lr_schedule

    model = FastSCNN(num_classes=2)
    optimizer = make_optimizer("sgd", lr_schedule("poly", base_lr=1e-2, niters=10, power=0.9))
    aug = make_device_augment(base_size=BASE, crop_size=CROP, pad_label=0)
    with pytest.raises(ValueError, match="spatial_shard"):
        make_train_step(
            model, get_loss_fn("dice"), optimizer,
            mesh=make_mesh(n_data=4, n_space=2), spatial_shard=True, device_aug=aug,
        )


def test_make_device_augment_jits_and_batches():
    img, mask = _fixture_pair()
    imgs = np.stack([img] * 4)
    masks = np.stack([mask] * 4)
    aug = make_device_augment(base_size=BASE, crop_size=CROP, pad_label=PAD)
    out_i, out_m = jax.jit(aug)(jnp.asarray(imgs), jnp.asarray(masks), jax.random.PRNGKey(7))
    assert out_i.shape == (4, CROP, CROP, 3) and out_i.dtype == jnp.float32
    assert out_m.shape == (4, CROP, CROP) and out_m.dtype == jnp.int32
    assert float(out_i.min()) >= 0.0 and float(out_i.max()) <= 255.0
    labels = np.unique(np.asarray(out_m))
    assert labels.min() >= -1 and labels.max() <= 18
    # samples actually differ (independent per-sample draws)
    assert not np.array_equal(np.asarray(out_m[0]), np.asarray(out_m[1])) or not np.array_equal(
        np.asarray(out_i[0]), np.asarray(out_i[1])
    )


# ---------------------------------------------------------------------------
# CUSTOM dataset chain (reference:custom.py:123-164): [multi-scale resize →]
# guard resize → crop → flip AFTER crop; no pad, no blur.
# ---------------------------------------------------------------------------

from fastscnn_tpu.data.device_aug import (  # noqa: E402
    CustomAugParams,
    apply_custom_params,
    draw_custom_params,
    make_device_augment_custom,
)

SCALES = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0)


def _binary_fixture(seed=0):
    img, _ = _fixture_pair(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    mask = (((yy // 11) + (xx // 13)) % 2).astype(np.int32)
    return img, mask


def _pil_custom_apply(img_arr, mask_arr, scale, x1, y1, flip, crop=CROP):
    """The reference custom chain with injected params
    (reference:custom.py:123-164, our data/custom.py::_sync_transform)."""
    img = Image.fromarray(img_arr)
    mask = Image.fromarray(mask_arr.astype(np.uint8))
    if scale is not None:
        w, h = img.size
        img = img.resize((int(w * scale), int(h * scale)), Image.BILINEAR)
        mask = mask.resize((int(w * scale), int(h * scale)), Image.NEAREST)
    w, h = img.size
    if w < crop or h < crop:
        nw, nh = max(w, crop), max(h, crop)
        img = img.resize((nw, nh), Image.BILINEAR)
        mask = mask.resize((nw, nh), Image.NEAREST)
    img = img.crop((x1, y1, x1 + crop, y1 + crop))
    mask = mask.crop((x1, y1, x1 + crop, y1 + crop))
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
        mask = mask.transpose(Image.FLIP_LEFT_RIGHT)
    return np.asarray(img, np.float32), np.asarray(mask, np.int32)


def _numpy_custom_nearest(mask_arr, scale_k, x1, y1, flip, crop=CROP, scales=SCALES):
    """Independent composed-index NEAREST reference (numpy ints)."""
    h, w = mask_arr.shape
    oh, ow = int(h * scales[scale_k]), int(w * scales[scale_k])
    gh, gw = max(oh, crop), max(ow, crop)
    gi = y1 + np.arange(crop)
    gj = x1 + np.arange(crop)
    ti = ((2 * gi + 1) * oh) // (2 * gh)
    tj = ((2 * gj + 1) * ow) // (2 * gw)
    si = np.clip(((2 * ti + 1) * h) // (2 * oh), 0, h - 1)
    sj = np.clip(((2 * tj + 1) * w) // (2 * ow), 0, w - 1)
    out = mask_arr[np.ix_(si, sj)]
    return out[:, ::-1] if flip else out


def _device_custom_apply(img, mask, scale_k, x1, y1, flip, multi=True,
                         compute_dtype=jnp.float32):
    scales = SCALES if multi else (1.0,)
    p = CustomAugParams(
        jnp.array([scale_k], jnp.int32),
        jnp.array([x1], jnp.int32),
        jnp.array([y1], jnp.int32),
        jnp.array([flip]),
    )
    di, dm = apply_custom_params(
        jnp.asarray(img)[None], jnp.asarray(mask)[None], p,
        crop_size=CROP, scales=scales, compute_dtype=compute_dtype,
    )
    return np.asarray(di[0]), np.asarray(dm[0])


def _random_custom_params(rng, multi=True):
    k = int(rng.integers(0, len(SCALES))) if multi else 0
    s = SCALES[k] if multi else 1.0
    gh = max(int(H * s), CROP)
    gw = max(int(W * s), CROP)
    x1 = int(rng.integers(0, gw - CROP + 1))
    y1 = int(rng.integers(0, gh - CROP + 1))
    return k, x1, y1, bool(rng.integers(0, 2))


def test_custom_single_scale_image_exact_vs_pil():
    # multi_scale off: the chain is crop+flip only (the guard is a no-op at
    # this geometry) — integer sampling, so device == PIL exactly.
    img, mask = _binary_fixture()
    rng = np.random.default_rng(10)
    for _ in range(6):
        _, x1, y1, flip = _random_custom_params(rng, multi=False)
        ref_img, ref_mask = _pil_custom_apply(img, mask, None, x1, y1, flip)
        di, dm = _device_custom_apply(img, mask, 0, x1, y1, flip, multi=False)
        assert np.abs(di - ref_img).max() <= 1e-4, (x1, y1, flip)
        assert (dm == ref_mask).all()


def test_custom_multi_scale_image_close_to_pil():
    img, mask = _binary_fixture()
    rng = np.random.default_rng(11)
    for _ in range(8):
        k, x1, y1, flip = _random_custom_params(rng, multi=True)
        ref_img, _ = _pil_custom_apply(img, mask, SCALES[k], x1, y1, flip)
        di, _ = _device_custom_apply(img, mask, k, x1, y1, flip, multi=True)
        # PIL quantizes to uint8 between the chained resizes and uses
        # fixed-point coefficients; we compose the two stages in float.
        assert np.abs(di - ref_img).max() <= 3.0, (k, x1, y1, flip)
        assert np.abs(di - ref_img).mean() <= 0.7


def test_custom_guard_resize_path_matches_pil():
    # scale 0.5 shrinks H below the crop at this geometry → the guard
    # resize (reference:custom.py:129-132) upscales H back to crop while
    # leaving W untouched.
    img, mask = _binary_fixture()
    s = 0.5
    oh = int(H * s)
    assert oh < CROP <= int(W * s)
    k = SCALES.index(s)
    for flip in (False, True):
        ref_img, ref_mask = _pil_custom_apply(img, mask, s, 3, 0, flip)
        di, dm = _device_custom_apply(img, mask, k, 3, 0, flip, multi=True)
        assert np.abs(di - ref_img).max() <= 3.0
        assert (dm == _numpy_custom_nearest(mask, k, 3, 0, flip)).all()
        assert (dm == ref_mask).mean() >= 0.97


def test_custom_mask_exact_vs_rational_reference():
    img, mask = _binary_fixture()
    rng = np.random.default_rng(12)
    agrees = []
    for _ in range(10):
        k, x1, y1, flip = _random_custom_params(rng, multi=True)
        _, ref_mask = _pil_custom_apply(img, mask, SCALES[k], x1, y1, flip)
        _, dm = _device_custom_apply(img, mask, k, x1, y1, flip, multi=True)
        assert (dm == _numpy_custom_nearest(mask, k, x1, y1, flip)).all()
        agrees.append((dm == ref_mask).mean())
    # PIL's incremental-float NEAREST + two chained quantized stages.
    assert np.mean(agrees) >= 0.97
    assert min(agrees) >= 0.9


def test_custom_bf16_image_and_exact_mask():
    img, mask = _binary_fixture()
    k, x1, y1, flip = _random_custom_params(np.random.default_rng(13))
    ref_img, _ = _pil_custom_apply(img, mask, SCALES[k], x1, y1, flip)
    di, dm = _device_custom_apply(img, mask, k, x1, y1, flip,
                                  compute_dtype=jnp.bfloat16)
    assert np.abs(di - ref_img).max() <= 6.0
    assert (dm == _numpy_custom_nearest(mask, k, x1, y1, flip)).all()


def test_custom_draw_distributions_match_reference():
    key = jax.random.PRNGKey(5)
    p = draw_custom_params(key, 8192, H, W, CROP, SCALES)
    k = np.asarray(p.scale_k)
    assert k.min() == 0 and k.max() == len(SCALES) - 1
    counts = np.bincount(k, minlength=len(SCALES)) / k.size
    assert np.abs(counts - 1.0 / len(SCALES)).max() < 0.02  # uniform choice
    assert abs(np.asarray(p.flip).mean() - 0.5) < 0.05
    oh = np.asarray([int(H * s) for s in SCALES])[k]
    ow = np.asarray([int(W * s) for s in SCALES])[k]
    gh, gw = np.maximum(oh, CROP), np.maximum(ow, CROP)
    y1, x1 = np.asarray(p.y1), np.asarray(p.x1)
    assert (y1 >= 0).all() and (y1 <= gh - CROP).all()
    assert (x1 >= 0).all() and (x1 <= gw - CROP).all()
    # inclusive upper bound actually reachable (reference random.randint)
    assert (y1 == gh - CROP)[gh > CROP].any()


def test_custom_keep_original_size_matches_pil():
    img, mask = _binary_fixture()
    base = 80
    aug = make_device_augment_custom(
        crop_size=CROP, keep_original_size=True, base_size=base,
        compute_dtype=jnp.float32,
    )
    imgs = jnp.asarray(np.stack([img] * 2))
    masks = jnp.asarray(np.stack([mask] * 2))
    out_i, out_m = jax.jit(aug)(imgs, masks, jax.random.PRNGKey(3))
    assert out_i.shape == (2, base, base, 3)
    assert out_m.shape == (2, base, base)
    pil_i = Image.fromarray(img).resize((base, base), Image.BILINEAR)
    pil_m = Image.fromarray(mask.astype(np.uint8)).resize((base, base), Image.NEAREST)
    for b in range(2):
        di = np.asarray(out_i[b])
        dm = np.asarray(out_m[b])
        ri = np.asarray(pil_i, np.float32)
        rm = np.asarray(pil_m, np.int32)
        if np.abs(di - ri).mean() > np.abs(di[:, ::-1] - ri).mean():
            di, dm = di[:, ::-1], dm[:, ::-1]  # that sample drew flip
        assert np.abs(di - ri).max() <= 2.5
        assert (dm == rm).mean() >= 0.97


def test_custom_augment_jits_and_batches():
    img, mask = _binary_fixture()
    imgs = np.stack([img] * 4)
    masks = np.stack([mask] * 4)
    aug = make_device_augment_custom(crop_size=CROP, multi_scale=True, scales=SCALES)
    out_i, out_m = jax.jit(aug)(jnp.asarray(imgs), jnp.asarray(masks), jax.random.PRNGKey(9))
    assert out_i.shape == (4, CROP, CROP, 3) and out_i.dtype == jnp.float32
    assert out_m.shape == (4, CROP, CROP) and out_m.dtype == jnp.int32
    labels = np.unique(np.asarray(out_m))
    assert set(labels.tolist()) <= {0, 1}  # binarized labels, no pad value
    assert not np.array_equal(np.asarray(out_m[0]), np.asarray(out_m[1])) or not np.array_equal(
        np.asarray(out_i[0]), np.asarray(out_i[1])
    )


# ---------------------------------------------------------------------------
# BDD100K keep-original-size chain (reference:bdd100k.py:242-259):
# hflip (p=0.5) → Gaussian blur (p=0.3, radius U[0,1)), native resolution.
# ---------------------------------------------------------------------------

from fastscnn_tpu.data.device_aug import (  # noqa: E402
    OriginalAugParams,
    apply_original_params,
    draw_original_params,
    make_device_augment_original,
)


def _pil_original_apply(img_arr, mask_arr, flip, blur_on, radius):
    """The reference keep-original-size chain with injected params
    (reference:bdd100k.py:242-259, our transforms.py::original_size)."""
    img = Image.fromarray(img_arr)
    mask = Image.fromarray(mask_arr.astype(np.uint8))
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
        mask = mask.transpose(Image.FLIP_LEFT_RIGHT)
    if blur_on:
        img = img.filter(ImageFilter.GaussianBlur(radius=radius))
    return np.asarray(img, np.float32), np.asarray(mask, np.int32)


def _device_original_apply(img, mask, flip, blur_on, radius,
                           compute_dtype=jnp.float32):
    p = OriginalAugParams(
        jnp.array([flip]), jnp.array([blur_on]),
        jnp.array([radius], jnp.float32),
    )
    di, dm = apply_original_params(
        jnp.asarray(img)[None], jnp.asarray(mask)[None], p,
        compute_dtype=compute_dtype,
    )
    return np.asarray(di[0]), np.asarray(dm[0])


def test_original_flip_only_exact_vs_pil():
    img, mask = _binary_fixture()
    for flip in (False, True):
        ref_img, ref_mask = _pil_original_apply(img, mask, flip, False, 0.0)
        di, dm = _device_original_apply(img, mask, flip, False, 0.0)
        # no resampling at all: lane reverse + identity blur is exact
        assert np.abs(di - ref_img).max() <= 1e-4, flip
        assert (dm == ref_mask).all()


def test_original_blur_close_to_pil():
    img, mask = _binary_fixture()
    rng = np.random.default_rng(21)
    for _ in range(6):
        flip = bool(rng.integers(0, 2))
        radius = float(rng.random())
        ref_img, ref_mask = _pil_original_apply(img, mask, flip, True, radius)
        di, dm = _device_original_apply(img, mask, flip, True, radius)
        # true Gaussian vs PIL's 3-pass box approximation (edges
        # replicate in both, matching PIL)
        assert np.abs(di - ref_img).max() <= 14.0, (flip, radius)
        assert np.abs(di - ref_img).mean() <= 1.2
        assert (dm == ref_mask).all()  # blur never touches labels


def test_original_draw_distributions_match_reference():
    p = draw_original_params(jax.random.PRNGKey(7), 8192, 0.3)
    assert abs(np.asarray(p.flip).mean() - 0.5) < 0.05
    assert abs(np.asarray(p.blur_on).mean() - 0.3) < 0.05  # blur_p=0.3
    r = np.asarray(p.radius)
    assert r.min() >= 0.0 and r.max() < 1.0


def test_original_bf16_stays_close():
    img, mask = _binary_fixture()
    ref_img, _ = _pil_original_apply(img, mask, True, True, 0.7)
    di, dm = _device_original_apply(img, mask, True, True, 0.7,
                                    compute_dtype=jnp.bfloat16)
    assert np.abs(di - ref_img).max() <= 15.0
    assert (dm == _pil_original_apply(img, mask, True, False, 0.0)[1]).all()


def test_original_augment_jits_and_batches():
    img, mask = _binary_fixture()
    imgs = np.stack([img] * 4)
    masks = np.stack([mask] * 4)
    aug = make_device_augment_original(blur_p=0.3)
    out_i, out_m = jax.jit(aug)(
        jnp.asarray(imgs), jnp.asarray(masks), jax.random.PRNGKey(11)
    )
    # native resolution preserved — no crop, no pad
    assert out_i.shape == (4, H, W, 3) and out_i.dtype == jnp.float32
    assert out_m.shape == (4, H, W) and out_m.dtype == jnp.int32
    # every mask is the original or its mirror (flip is the only label op)
    for b in range(4):
        m = np.asarray(out_m[b])
        assert (m == mask).all() or (m == mask[:, ::-1]).all()
