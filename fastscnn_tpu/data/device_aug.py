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
  * PIL's GaussianBlur is a 3-pass box approximation with edge
    replication; we use a true truncated Gaussian renormalized at the
    crop edges. radius < 1 in this recipe, so both are near-identity.
  * PIL quantizes to uint8 after every stage and uses fixed-point
    filter coefficients; we stay in floating point end to end
    (bf16 matmuls, f32 accumulation on the MXU).

Random draws match the reference's distributions exactly (inclusive
``random.randint`` bounds, Bernoulli(0.5) flip/blur, U[0,1) radius).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["AugParams", "draw_params", "apply_params", "make_device_augment"]


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
    """(crop, crop) truncated-Gaussian row-normalized band matrix;
    identity when blur is off (sigma→1e-3 makes it one-hot exactly)."""
    f32 = jnp.float32
    sigma = jnp.maximum(jnp.where(blur_on, radius, 0.0), 1e-3).astype(f32)
    d = jnp.arange(crop, dtype=f32)
    d2 = (d[:, None] - d[None, :]) ** 2
    g = jnp.exp(-d2 / (2.0 * sigma * sigma))
    return g / g.sum(axis=1, keepdims=True)


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
