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
