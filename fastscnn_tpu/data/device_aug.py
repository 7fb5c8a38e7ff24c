"""On-device PSP-style training augmentation (TPU-native, opt-in).

The reference augments on the host with PIL (random hflip → random
short-edge scale in [0.5·base, 2.0·base] → bottom/right zero-pad to
crop → random crop → random Gaussian blur; reference:
data_loader/cityscapes.py:115-150). The measured input-pipeline story
(docs/PERFORMANCE.md "Input pipeline") shows that after the decoded
cache removes image decode, the PIL augmentation itself is what's left
of the per-record host cost — and it is exactly the part a TPU can do
for ~free: every step of the chain is a per-sample *linear* operator
along one axis, so the whole pipeline becomes two batched MXU
contractions per tensor with per-sample sampling matrices built
elementwise on device from six random scalars.

Formulation (per sample, per axis; all shapes static under jit):

  resize+crop   out[i] = Σ_j W[i, j] · src[j] with PIL's triangle
                filter weights W[i, j] = tri((j + 0.5 − c_i)/fs),
                c_i = (y1 + i + 0.5)·(src/resized), fs = max(scale, 1)
                (antialias on downscale, exactly PIL Resample.c's
                precompute_coeffs math), rows renormalized — window
                clipping at image bounds falls out of the
                normalization. Rows past the resized extent are zero
                (= the reference's bottom/right zero pad).
  hflip         source index reversal folded into the same matrix.
  blur          a truncated-Gaussian band matrix composed into the
                H/W matrices (G @ W), applied to the image only.
  mask          NEAREST sampling as a one-hot matrix (exact integer
                source indices), so the label matmul is exact; pad
                region filled with ``pad_label`` (= the dataset's
                transform of the reference's raw-0 pad fill).

Documented divergences from the PIL path (which stays the default and
keeps its pixel-parity gate vs the reference):

  * PIL computes NEAREST indices by *incrementally accumulating* the
    f64 scale (ImagingScaleAffine's ``xo += a[0]``), so at exact ties
    ((2i+1)·src ≡ 0 mod 2·out) its result depends on accumulated
    rounding. We use the exact rational index ((2i+1)·src)//(2·out);
    tie rows may pick the neighboring source row. Statistically
    gated against PIL in tests/test_device_aug.py.
  * PIL's GaussianBlur is a 3-pass box approximation; we use a true
    truncated Gaussian (same edge replication — out-of-bounds tap mass
    folds onto the clamped edge pixel). radius < 1 in this recipe, so
    both are near-identity.
  * PIL quantizes to uint8 after every stage and uses fixed-point
    filter coefficients; we stay in floating point end to end
    (bf16 matmuls, f32 accumulation on the MXU).

Random draws match the reference's distributions exactly (inclusive
``random.randint`` bounds, Bernoulli(0.5) flip/blur, U[0,1) radius).

The CUSTOM dataset's chain (reference:custom.py:123-164) differs from
the PSP chain — optional multi-scale both-axes resize (uniform choice
over [0.5..2.0] in quarters) → min-size guard resize to ≥ crop →
random crop → hflip AFTER crop, no pad and no blur — and is covered by
:func:`make_device_augment_custom`. Both resizes plus the crop compose
per axis into ONE (crop, src) sampling matrix: the guard+crop stage at
filterscale 1 touches at most two rows of the scale-resize matrix per
output row (exact two-tap lerp, PIL's clipped-window renormalization
included), so the total is a lerp of two directly-computed scale-matrix
rows — no (crop, M) @ (M, src) matmul and no gather. NEAREST masks
compose by exact
integer index chaining (idx_scale ∘ idx_guard), one one-hot matmul
total. Additional documented divergence: PIL quantizes to uint8
between the two chained resizes (multi-scale mode only); we compose
them in float. ``keep_original_size`` mode (resize to base² + flip) is
static per-sample and also provided.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "AugParams",
    "draw_params",
    "apply_params",
    "make_device_augment",
    "CustomAugParams",
    "draw_custom_params",
    "apply_custom_params",
    "make_device_augment_custom",
    "OriginalAugParams",
    "draw_original_params",
    "apply_original_params",
    "make_device_augment_original",
]


class AugParams(NamedTuple):
    """Per-sample augmentation draws (each shaped (B,))."""

    flip: jnp.ndarray  # bool — hflip before resize
    short: jnp.ndarray  # i32 — target short-edge size
    y1: jnp.ndarray  # i32 — crop top in the padded resized image
    x1: jnp.ndarray  # i32 — crop left
    blur_on: jnp.ndarray  # bool
    radius: jnp.ndarray  # f32 in [0, 1)


def _resized_dims(short, src_h: int, src_w: int):
    """PIL short-edge resize dims; exact-integer version of the
    reference's ``int(1.0 * w * oh / h)`` (f64 is exact at these
    magnitudes, so trunc == floor-div)."""
    short = short.astype(jnp.int32)
    if src_h > src_w:
        ow = short
        oh = (src_h * ow) // src_w
    else:
        oh = short
        ow = (src_w * oh) // src_h
    return oh, ow


def draw_params(key, batch: int, src_h: int, src_w: int, base_size: int, crop_size: int) -> AugParams:
    """Draw per-sample augmentation parameters (reference distributions)."""
    kf, ks, ky, kx, kb, kr = jax.random.split(key, 6)
    flip = jax.random.bernoulli(kf, 0.5, (batch,))
    lo = int(base_size * 0.5)
    hi = int(base_size * 2.0)
    short = jax.random.randint(ks, (batch,), lo, hi + 1, dtype=jnp.int32)
    oh, ow = _resized_dims(short, src_h, src_w)
    ph = jnp.maximum(oh, crop_size)
    pw = jnp.maximum(ow, crop_size)
    # random.randint(0, n) inclusive — per-sample traced bounds.
    y1 = jax.random.randint(ky, (batch,), 0, ph - crop_size + 1, dtype=jnp.int32)
    x1 = jax.random.randint(kx, (batch,), 0, pw - crop_size + 1, dtype=jnp.int32)
    blur_on = jax.random.bernoulli(kb, 0.5, (batch,))
    radius = jax.random.uniform(kr, (batch,), jnp.float32)
    return AugParams(flip, short, y1, x1, blur_on, radius)


def _axis_matrices(g0, resized, flip, src: int, crop: int):
    """Per-sample (crop, src) bilinear weight matrix, one-hot nearest
    matrix, and row-validity vector for one axis. Traced scalars:
    g0 (crop offset), resized (post-resize extent), flip."""
    f32 = jnp.float32
    g = g0 + jnp.arange(crop, dtype=jnp.int32)  # global rows in the resized image
    valid = g < resized

    scale = jnp.asarray(src, f32) / resized.astype(f32)
    fscale = jnp.maximum(scale, 1.0)
    center = (g.astype(f32) + 0.5) * scale  # (crop,)
    j = jnp.arange(src, dtype=f32)
    # hflip before resize == reversed source coordinate.
    pos = jnp.where(flip, jnp.asarray(src, f32) - 0.5 - j, j + 0.5)  # (src,)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[None, :] - center[:, None]) / fscale)
    w = w * valid[:, None]
    w = w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-12)

    # Exact rational NEAREST: floor((i+0.5) * src / resized).
    num = (2 * g + 1) * src
    den = 2 * resized
    idx = jnp.clip(num // den, 0, src - 1)
    idx = jnp.where(flip, src - 1 - idx, idx)
    onehot = (jnp.arange(src, dtype=jnp.int32)[None, :] == idx[:, None]) & valid[:, None]
    return w, onehot.astype(f32), valid


def _blur_matrix(blur_on, radius, crop: int):
    """(crop, crop) truncated-Gaussian band matrix with PIL-style edge
    replication (out-of-bounds tap mass folds onto the clamped edge
    pixel); identity when blur is off (sigma→1e-3 is one-hot exactly).
    radius < 1 in every recipe, so an 8-px extension covers the tails."""
    f32 = jnp.float32
    sigma = jnp.maximum(jnp.where(blur_on, radius, 0.0), 1e-3).astype(f32)
    ext = 8
    i = jnp.arange(crop, dtype=f32)
    pos = jnp.arange(-ext, crop + ext, dtype=f32)
    g = jnp.exp(-((i[:, None] - pos[None, :]) ** 2) / (2.0 * sigma * sigma))
    g = g / g.sum(axis=1, keepdims=True)
    m = g[:, ext : ext + crop]
    m = m.at[:, 0].add(g[:, :ext].sum(axis=1))
    m = m.at[:, -1].add(g[:, ext + crop :].sum(axis=1))
    return m


def apply_params(
    images,
    masks,
    params: AugParams,
    *,
    crop_size: int,
    base_size: int,
    pad_label: int,
    compute_dtype=jnp.bfloat16,
):
    """Apply the augmentation chain with the given per-sample params.

    images: (B, H, W, 3) uint8/float — source resolution (uniform).
    masks:  (B, H, W) int32 — already label-transformed (remap happens
            on the host at load; NEAREST sampling commutes with it).
    Returns (B, crop, crop, 3) float32 in [0, 255] and (B, crop, crop)
    int32 with ``pad_label`` in the padded region.
    """
    b, src_h, src_w = images.shape[0], images.shape[1], images.shape[2]
    oh, ow = _resized_dims(params.short, src_h, src_w)

    def matrices(g0, resized, flip, src):
        return _axis_matrices(g0, resized, flip, src, crop_size)

    wh, nh, vh = jax.vmap(lambda y1, r, f: matrices(y1, r, f, src_h))(
        params.y1, oh, jnp.zeros_like(params.flip)  # flip never touches H
    )
    ww, nw, vw = jax.vmap(lambda x1, r, f: matrices(x1, r, f, src_w))(
        params.x1, ow, params.flip
    )
    gm = jax.vmap(_blur_matrix, in_axes=(0, 0, None))(params.blur_on, params.radius, crop_size)

    # Blur composes into the image sampling matrices (blur-after-crop
    # along separable axes); the mask path stays un-blurred.
    cd = compute_dtype
    mh = jnp.einsum("bik,bkh->bih", gm, wh).astype(cd)
    mw = jnp.einsum("bjk,bkw->bjw", gm, ww).astype(cd)

    x = images.astype(cd)
    t = jnp.einsum("bih,bhwc->biwc", mh, x)
    img = jnp.einsum("bjw,biwc->bijc", mw, t).astype(jnp.float32)
    img = jnp.clip(img, 0.0, 255.0)

    mf = masks.astype(jnp.float32)
    tm = jnp.einsum("bih,bhw->biw", nh, mf)
    mm = jnp.einsum("bjw,biw->bij", nw, tm)
    inside = vh[:, :, None] & vw[:, None, :]
    mask = jnp.where(inside, jnp.rint(mm).astype(jnp.int32), jnp.int32(pad_label))
    return img, mask


def make_device_augment(*, base_size: int, crop_size: int, pad_label: int, compute_dtype=jnp.bfloat16):
    """Build ``augment(images_u8, masks_i32, key) -> (img_f32, mask_i32)``
    for use inside the jitted train step (source dims read at trace
    time, so one builder serves any uniform-size dataset)."""

    def augment(images, masks, key):
        params = draw_params(
            key, images.shape[0], images.shape[1], images.shape[2], base_size, crop_size
        )
        return apply_params(
            images,
            masks,
            params,
            crop_size=crop_size,
            base_size=base_size,
            pad_label=pad_label,
            compute_dtype=compute_dtype,
        )

    return augment


# ---------------------------------------------------------------------------
# CUSTOM dataset chain (reference:custom.py:123-164): [multi-scale resize →]
# min-size guard resize → random crop → hflip AFTER crop. No pad, no blur.
# ---------------------------------------------------------------------------


class CustomAugParams(NamedTuple):
    """Per-sample draws for the custom chain (each shaped (B,))."""

    scale_k: jnp.ndarray  # i32 — index into the static scales tuple
    x1: jnp.ndarray  # i32 — crop left in the guard-resized image
    y1: jnp.ndarray  # i32 — crop top
    flip: jnp.ndarray  # bool — hflip AFTER crop


def _custom_dims(scales, src: int):
    """Static per-choice post-scale extents, exactly PIL-side
    ``int(src * scale)`` (host float trunc, reference:custom.py:127)."""
    return jnp.asarray([int(src * s) for s in scales], jnp.int32)


def draw_custom_params(key, batch: int, src_h: int, src_w: int, crop_size: int, scales) -> CustomAugParams:
    """Reference distributions: uniform ``random.choice(scales)`` shared by
    both axes, inclusive ``randint(0, dim - crop)`` per axis after the
    guard resize, Bernoulli(0.5) flip."""
    kk, kx, ky, kf = jax.random.split(key, 4)
    n = len(scales)
    scale_k = (
        jax.random.randint(kk, (batch,), 0, n, dtype=jnp.int32)
        if n > 1
        else jnp.zeros((batch,), jnp.int32)
    )
    ow = _custom_dims(scales, src_w)[scale_k]
    oh = _custom_dims(scales, src_h)[scale_k]
    gw = jnp.maximum(ow, crop_size)
    gh = jnp.maximum(oh, crop_size)
    x1 = jax.random.randint(kx, (batch,), 0, gw - crop_size + 1, dtype=jnp.int32)
    y1 = jax.random.randint(ky, (batch,), 0, gh - crop_size + 1, dtype=jnp.int32)
    flip = jax.random.bernoulli(kf, 0.5, (batch,))
    return CustomAugParams(scale_k, x1, y1, flip)


def _two_tap(center, extent):
    """Two-tap triangle sampling at filterscale 1 (the guard+crop stage is
    never a downscale): indices, weights with PIL's clipped-window
    renormalization. center f32 (rows,), extent traced i32."""
    f32 = jnp.float32
    x = center - 0.5
    k = jnp.floor(x).astype(jnp.int32)
    f = x - k.astype(f32)
    w0 = jnp.where((k >= 0) & (k < extent), 1.0 - f, 0.0)
    w1 = jnp.where((k + 1 >= 0) & (k + 1 < extent), f, 0.0)
    tot = jnp.maximum(w0 + w1, 1e-12)
    return (
        jnp.clip(k, 0, extent - 1),
        jnp.clip(k + 1, 0, extent - 1),
        w0 / tot,
        w1 / tot,
    )


def _scale_matrix(scale_out, src: int, n_rows: int):
    """(n_rows, src) PIL-triangle resize src → scale_out (traced extent);
    rows ≥ scale_out are zero. Same math as the PSP ``_axis_matrices``."""
    f32 = jnp.float32
    g = jnp.arange(n_rows, dtype=jnp.int32)
    valid = g < scale_out
    return _scale_rows(g, scale_out, src) * valid[:, None]


def _scale_rows(k, scale_out, src: int):
    """Selected rows ``k`` of the scale-resize matrix, computed directly
    from the triangle formula (no (n_rows, src) materialization + gather
    — at the bdd/custom shapes that intermediate is ~3× the two needed
    row sets). k i32 (rows,) — taps outside [0, scale_out) must already
    carry zero weight from the caller (``_two_tap`` guarantees it)."""
    f32 = jnp.float32
    scale = jnp.asarray(src, f32) / scale_out.astype(f32)
    fscale = jnp.maximum(scale, 1.0)
    center = (k.astype(f32) + 0.5) * scale
    j = jnp.arange(src, dtype=f32) + 0.5
    w = jnp.maximum(0.0, 1.0 - jnp.abs(j[None, :] - center[:, None]) / fscale)
    return w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-12)


def _custom_rows(g0, flip_rows, crop: int):
    """Output-row coordinates for the guard+crop stage, mirrored when the
    post-crop hflip is on (reference flips AFTER crop)."""
    i = jnp.arange(crop, dtype=jnp.int32)
    return g0 + jnp.where(flip_rows, crop - 1 - i, i)


def _custom_axis_image(scale_out, g0, flip_rows, src: int, crop: int, multi: bool):
    """Per-sample (crop, src) total image sampling matrix for one axis:
    guard+crop (two-tap) composed over the multi-scale resize matrix."""
    f32 = jnp.float32
    gh = jnp.maximum(scale_out, crop)
    rows = _custom_rows(g0, flip_rows, crop)
    center = (rows.astype(f32) + 0.5) * (scale_out.astype(f32) / gh.astype(f32))
    k0, k1, w0, w1 = _two_tap(center, scale_out)
    if not multi:
        # scale stage is identity (scale_out == src statically): build the
        # two-tap rows directly over the source columns.
        j = jnp.arange(src, dtype=jnp.int32)
        return (
            w0[:, None] * (j[None, :] == k0[:, None]).astype(f32)
            + w1[:, None] * (j[None, :] == k1[:, None]).astype(f32)
        )
    # Rows k0/k1 of the scale matrix computed directly (k clipped into
    # range by _two_tap, whose weights are zero for out-of-range taps;
    # in-range rows never need the validity mask).
    return w0[:, None] * _scale_rows(k0, scale_out, src) + w1[:, None] * _scale_rows(k1, scale_out, src)


def _custom_axis_nearest(scale_out, g0, flip_rows, src: int, crop: int):
    """Per-sample (crop, src) one-hot NEAREST matrix: exact integer index
    chaining idx_scale ∘ idx_guard (both PIL affine-NEAREST maps)."""
    rows = _custom_rows(g0, flip_rows, crop)
    gh = jnp.maximum(scale_out, crop)
    t = ((2 * rows + 1) * scale_out) // (2 * gh)  # guard+crop → scaled dims
    idx = jnp.clip(((2 * t + 1) * src) // (2 * scale_out), 0, src - 1)
    onehot = jnp.arange(src, dtype=jnp.int32)[None, :] == idx[:, None]
    return onehot.astype(jnp.float32)


def apply_custom_params(
    images,
    masks,
    params: CustomAugParams,
    *,
    crop_size: int,
    scales,
    compute_dtype=jnp.bfloat16,
):
    """Apply the custom chain with the given per-sample params.

    images: (B, H, W, 3) uint8/float, uniform source resolution.
    masks:  (B, H, W) int32, already label-transformed (binarized for the
            custom dataset; NEAREST sampling commutes with the remap).
    Returns (B, crop, crop, 3) f32 in [0, 255] and (B, crop, crop) i32.
    There is no pad region: the guard resize keeps both axes ≥ crop.
    """
    src_h, src_w = int(images.shape[1]), int(images.shape[2])
    multi = len(scales) > 1 or float(scales[0]) != 1.0
    if not multi and src_h >= crop_size and src_w >= crop_size:
        # The whole chain is crop + flip (the scale stage is identity and
        # the guard never triggers — both static facts): a vmapped
        # dynamic_slice + lane reverse is exact and costs ~nothing on the
        # MXU (no sampling matmuls).
        def one(img, msk, y1, x1, flip):
            ci = jax.lax.dynamic_slice(img, (y1, x1, 0), (crop_size, crop_size, 3))
            cm = jax.lax.dynamic_slice(msk, (y1, x1), (crop_size, crop_size))
            ci = jnp.where(flip, ci[:, ::-1, :], ci)
            cm = jnp.where(flip, cm[:, ::-1], cm)
            return ci, cm
        ci, cm = jax.vmap(one)(images, masks, params.y1, params.x1, params.flip)
        return ci.astype(jnp.float32), cm.astype(jnp.int32)
    oh = _custom_dims(scales, src_h)[params.scale_k]
    ow = _custom_dims(scales, src_w)[params.scale_k]
    no_flip = jnp.zeros_like(params.flip)

    wh = jax.vmap(
        lambda so, g0, f: _custom_axis_image(so, g0, f, src_h, crop_size, multi)
    )(oh, params.y1, no_flip)
    ww = jax.vmap(
        lambda so, g0, f: _custom_axis_image(so, g0, f, src_w, crop_size, multi)
    )(ow, params.x1, params.flip)
    nh = jax.vmap(lambda so, g0, f: _custom_axis_nearest(so, g0, f, src_h, crop_size))(
        oh, params.y1, no_flip
    )
    nw = jax.vmap(lambda so, g0, f: _custom_axis_nearest(so, g0, f, src_w, crop_size))(
        ow, params.x1, params.flip
    )

    cd = compute_dtype
    x = images.astype(cd)
    t = jnp.einsum("bih,bhwc->biwc", wh.astype(cd), x)
    img = jnp.einsum("bjw,biwc->bijc", ww.astype(cd), t).astype(jnp.float32)
    img = jnp.clip(img, 0.0, 255.0)

    mf = masks.astype(jnp.float32)
    tm = jnp.einsum("bih,bhw->biw", nh, mf)
    mm = jnp.einsum("bjw,biw->bij", nw, tm)
    return img, jnp.rint(mm).astype(jnp.int32)


def make_device_augment_custom(
    *,
    crop_size: int,
    multi_scale: bool = False,
    scales=(0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0),
    keep_original_size: bool = False,
    base_size: int = 520,
    compute_dtype=jnp.bfloat16,
):
    """Build ``augment(images_u8, masks_i32, key)`` for the CUSTOM chain
    (reference:custom.py:123-164), for use inside the jitted train step.

    ``keep_original_size`` mode resizes every sample to base_size² (+
    random flip) — the sampling matrices are static, only the flip draw
    is per-sample; output spatial dims are (base_size, base_size).
    """
    use_scales = tuple(scales) if multi_scale else (1.0,)

    def augment(images, masks, key):
        b, src_h, src_w = images.shape[0], int(images.shape[1]), int(images.shape[2])
        cd = compute_dtype
        if keep_original_size:
            kf = jax.random.bernoulli(key, 0.5, (b,))
            dst = jnp.asarray(base_size, jnp.int32)
            sh = _scale_matrix(dst, src_h, base_size)  # static (base, src_h)
            sw = _scale_matrix(dst, src_w, base_size)
            # NEAREST resize src → base (single stage): exact rational.
            i = jnp.arange(base_size, dtype=jnp.int32)
            idx_h = jnp.clip(((2 * i + 1) * src_h) // (2 * base_size), 0, src_h - 1)
            idx_w = jnp.clip(((2 * i + 1) * src_w) // (2 * base_size), 0, src_w - 1)
            nh = (jnp.arange(src_h)[None, :] == idx_h[:, None]).astype(jnp.float32)
            nw = (jnp.arange(src_w)[None, :] == idx_w[:, None]).astype(jnp.float32)
            swf = jnp.where(kf[:, None, None], sw[None, ::-1, :], sw[None, :, :])
            nwf = jnp.where(kf[:, None, None], nw[None, ::-1, :], nw[None, :, :])
            x = images.astype(cd)
            t = jnp.einsum("ih,bhwc->biwc", sh.astype(cd), x)
            img = jnp.einsum("bjw,biwc->bijc", swf.astype(cd), t).astype(jnp.float32)
            img = jnp.clip(img, 0.0, 255.0)
            mf = masks.astype(jnp.float32)
            tm = jnp.einsum("ih,bhw->biw", nh, mf)
            mm = jnp.einsum("bjw,biw->bij", nwf, tm)
            return img, jnp.rint(mm).astype(jnp.int32)
        params = draw_custom_params(key, b, src_h, src_w, crop_size, use_scales)
        return apply_custom_params(
            images, masks, params,
            crop_size=crop_size, scales=use_scales, compute_dtype=cd,
        )

    return augment


# ---------------------------------------------------------------------------
# BDD100K keep-original-size chain (reference:bdd100k.py:242-259): hflip
# (p=0.5) → Gaussian blur (p=blur_p, default 0.3, radius U[0,1)) at the
# native resolution — no resize, no crop, no pad.
# ---------------------------------------------------------------------------


class OriginalAugParams(NamedTuple):
    """Per-sample draws for the keep-original-size chain (each (B,))."""

    flip: jnp.ndarray  # bool — hflip at native resolution
    blur_on: jnp.ndarray  # bool — Bernoulli(blur_p)
    radius: jnp.ndarray  # f32 in [0, 1)


def draw_original_params(key, batch: int, blur_p: float) -> OriginalAugParams:
    """Reference distributions (reference:bdd100k.py:246-258):
    Bernoulli(0.5) flip, Bernoulli(blur_p) blur, radius U[0,1)."""
    kf, kb, kr = jax.random.split(key, 3)
    flip = jax.random.bernoulli(kf, 0.5, (batch,))
    blur_on = jax.random.bernoulli(kb, float(blur_p), (batch,))
    radius = jax.random.uniform(kr, (batch,), jnp.float32)
    return OriginalAugParams(flip, blur_on, radius)


def apply_original_params(
    images,
    masks,
    params: OriginalAugParams,
    *,
    compute_dtype=jnp.bfloat16,
):
    """Apply flip + separable Gaussian blur at native resolution.

    images: (B, H, W, 3) uint8/float; masks: (B, H, W) int32 (already
    label-transformed). Returns (B, H, W, 3) f32 in [0, 255] and the
    flipped masks (blur never touches labels). The blur is the same
    per-sample band-matrix operator as the PSP chain's `_blur_matrix`
    (true truncated Gaussian; the PIL 3-pass box approximation parity
    is gated statistically like the PSP chain), applied as one (H, H)
    and one (W, W) batched matmul — MXU work, no host cost.
    """
    src_h, src_w = int(images.shape[1]), int(images.shape[2])
    cd = compute_dtype
    flip = params.flip
    x = jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images).astype(cd)
    gh = jax.vmap(_blur_matrix, in_axes=(0, 0, None))(params.blur_on, params.radius, src_h)
    gw = jax.vmap(_blur_matrix, in_axes=(0, 0, None))(params.blur_on, params.radius, src_w)
    t = jnp.einsum("bih,bhwc->biwc", gh.astype(cd), x)
    img = jnp.einsum("bjw,biwc->bijc", gw.astype(cd), t).astype(jnp.float32)
    img = jnp.clip(img, 0.0, 255.0)
    mask = jnp.where(flip[:, None, None], masks[:, :, ::-1], masks).astype(jnp.int32)
    return img, mask


def make_device_augment_original(*, blur_p: float = 0.3, compute_dtype=jnp.bfloat16):
    """Build ``augment(images_u8, masks_i32, key)`` for the BDD100K
    keep-original-size chain, for use inside the jitted train step."""

    def augment(images, masks, key):
        params = draw_original_params(key, images.shape[0], blur_p)
        return apply_original_params(images, masks, params, compute_dtype=compute_dtype)

    return augment
