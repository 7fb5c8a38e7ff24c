"""Synchronized image/mask augmentation pipeline (PIL-based).

Matches the reference's PSP-style augmentation math exactly
(reference:data_loader/cityscapes.py:93-150, identical copies in the
tusimple/bdd100k loaders):

train: random hflip → random short-edge scale in [0.5·base, 2.0·base] →
       bottom/right zero-pad to crop size → random crop → random
       Gaussian blur (radius ∈ [0,1), p=0.5)
val:   short-edge resize to crop size → center crop
testval: identity (native resolution)

Images come out as uint8 HWC numpy (normalization happens on device in
the jitted step — SURVEY §7.1.3); masks as int32 HW.

Randomness: an explicit ``random.Random`` can be injected for
reproducibility; default uses the module-global ``random`` like the
reference.
"""

from __future__ import annotations

import random as _global_random

import numpy as np
from PIL import Image, ImageFilter, ImageOps

__all__ = ["SyncTransforms"]


class SyncTransforms:
    def __init__(self, base_size=520, crop_size=480, rng=None):
        self.base_size = base_size
        self.crop_size = crop_size
        self.rng = rng if rng is not None else _global_random

    # -- train ---------------------------------------------------------------
    def train(self, img: Image.Image, mask: Image.Image):
        rng = self.rng
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
            mask = mask.transpose(Image.FLIP_LEFT_RIGHT)
        crop_size = self.crop_size
        short_size = rng.randint(int(self.base_size * 0.5), int(self.base_size * 2.0))
        w, h = img.size
        if h > w:
            ow = short_size
            oh = int(1.0 * h * ow / w)
        else:
            oh = short_size
            ow = int(1.0 * w * oh / h)
        img = img.resize((ow, oh), Image.BILINEAR)
        mask = mask.resize((ow, oh), Image.NEAREST)
        if short_size < crop_size:
            padh = crop_size - oh if oh < crop_size else 0
            padw = crop_size - ow if ow < crop_size else 0
            img = ImageOps.expand(img, border=(0, 0, padw, padh), fill=0)
            mask = ImageOps.expand(mask, border=(0, 0, padw, padh), fill=0)
        w, h = img.size
        x1 = rng.randint(0, w - crop_size)
        y1 = rng.randint(0, h - crop_size)
        img = img.crop((x1, y1, x1 + crop_size, y1 + crop_size))
        mask = mask.crop((x1, y1, x1 + crop_size, y1 + crop_size))
        if rng.random() < 0.5:
            img = img.filter(ImageFilter.GaussianBlur(radius=rng.random()))
        return img, mask

    # -- val -----------------------------------------------------------------
    def val(self, img: Image.Image, mask: Image.Image):
        outsize = self.crop_size
        short_size = outsize
        w, h = img.size
        if w > h:
            oh = short_size
            ow = int(1.0 * w * oh / h)
        else:
            ow = short_size
            oh = int(1.0 * h * ow / w)
        img = img.resize((ow, oh), Image.BILINEAR)
        mask = mask.resize((ow, oh), Image.NEAREST)
        w, h = img.size
        x1 = int(round((w - outsize) / 2.0))
        y1 = int(round((h - outsize) / 2.0))
        img = img.crop((x1, y1, x1 + outsize, y1 + outsize))
        mask = mask.crop((x1, y1, x1 + outsize, y1 + outsize))
        return img, mask

    # -- BDD100K extras (reference:data_loader/bdd100k.py:242-278) -----------
    def original_size(self, img, mask, blur_p=0.3):
        rng = self.rng
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
            mask = mask.transpose(Image.FLIP_LEFT_RIGHT)
        if rng.random() < blur_p:
            img = img.filter(ImageFilter.GaussianBlur(radius=rng.random()))
        return img, mask

    def multi_scale(self, img, mask, min_scale=0.8, max_scale=1.2, blur_p=0.3):
        rng = self.rng
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
            mask = mask.transpose(Image.FLIP_LEFT_RIGHT)
        scale = rng.uniform(min_scale, max_scale)
        w, h = img.size
        img = img.resize((int(w * scale), int(h * scale)), Image.BILINEAR)
        mask = mask.resize((int(w * scale), int(h * scale)), Image.NEAREST)
        if rng.random() < blur_p:
            img = img.filter(ImageFilter.GaussianBlur(radius=rng.random()))
        return img, mask


def to_numpy_pair(img: Image.Image, mask) -> tuple[np.ndarray, np.ndarray]:
    return np.asarray(img, np.uint8), np.asarray(mask, np.int32)
