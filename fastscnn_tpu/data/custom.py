"""Custom images/ + masks/ folder dataset.

Port of reference:data_loader/custom.py:10-188: basename-matched
image/mask pairs, mask binarization ``>128 → 1``, sklearn-compatible
90/10 train/val split with seed 42, crop / original-size / multi-scale
train modes.

Normalization note: this dataset is the one the reference feeds as plain
/255 (no ImageNet mean/std — reference:custom.py:160-164), which is why
the E2E export graph defaults to mean/std=None. We record that as
``normalization='unit'`` for the trainer/engine to honor.
"""

from __future__ import annotations

import os
import random as _random

import numpy as np
from PIL import Image

from fastscnn_tpu.data import decoded_cache
from fastscnn_tpu.data.transforms import SyncTransforms

__all__ = ["CustomDataset"]


def _train_test_split(items, train_size, seed):
    """Reproduce ``sklearn.model_selection.train_test_split(..., random_state=42)``
    ordering (shuffled permutation split) without requiring sklearn."""
    try:
        from sklearn.model_selection import train_test_split

        return train_test_split(items, train_size=train_size, random_state=seed)
    except Exception:
        rng = np.random.RandomState(seed)
        n_train = int(np.floor(train_size * len(items)))
        perm = rng.permutation(len(items))
        test = [items[i] for i in perm[: len(items) - n_train]]
        train = [items[i] for i in perm[len(items) - n_train :]]
        return train, test


class CustomDataset:
    NUM_CLASS = 2
    normalization = "unit"
    # device-aug: the custom chain never pads (the min-size guard resize
    # keeps both axes ≥ crop), so the pad label is unused; 0 = background.
    DEVICE_AUG_PAD_LABEL = 0
    DEVICE_AUG_CHAIN = "custom"  # reference:custom.py:123-164 (not PSP)

    def __init__(
        self,
        root="./data/custom",
        split="train",
        mode=None,
        base_size=520,
        crop_size=480,
        train_split=0.9,
        multi_scale=False,
        keep_original_size=False,
        rng=None,
        **kwargs,
    ):
        self.root = root
        self.split = split
        self.mode = mode if mode is not None else split
        self.base_size = base_size
        self.crop_size = crop_size
        self.multi_scale = multi_scale
        self.keep_original_size = keep_original_size
        self.images_root = os.path.join(root, "images")
        self.masks_root = os.path.join(root, "masks")
        self.tf = SyncTransforms(base_size, crop_size, rng=rng)
        self._rng = rng if rng is not None else _random
        self.scales = [0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0]

        all_filenames = []
        for filename in sorted(os.listdir(self.images_root)):
            if filename.lower().endswith((".jpg", ".jpeg", ".png")):
                basename = os.path.splitext(filename)[0]
                if os.path.exists(os.path.join(self.masks_root, basename + ".png")):
                    all_filenames.append(basename)
        if not all_filenames:
            raise FileNotFoundError(f"No matching image-mask pairs found in {root}")
        if len(all_filenames) == 1:
            self.filenames = all_filenames
        else:
            train_files, val_files = _train_test_split(all_filenames, train_split, 42)
            if split == "train":
                self.filenames = train_files
            elif split == "val":
                self.filenames = val_files
            else:
                self.filenames = all_filenames

    def _find_image(self, basename):
        for ext in (".jpg", ".jpeg", ".png"):
            p = os.path.join(self.images_root, basename + ext)
            if os.path.exists(p):
                return p
        raise FileNotFoundError(f"Image not found for {basename}")

    def __getitem__(self, index):
        basename = self.filenames[index]
        image = decoded_cache.open_rgb(self._find_image(basename))
        if self.mode == "test":
            return np.asarray(image, np.uint8), basename
        mask_arr = np.asarray(decoded_cache.open_image(os.path.join(self.masks_root, basename + ".png")))
        if mask_arr.ndim == 3:
            mask_arr = mask_arr[:, :, 0]
        mask = Image.fromarray((mask_arr > 128).astype(np.uint8))

        if self.mode == "device-aug":
            # native resolution + binarized labels; the custom aug chain
            # runs on device inside the jitted train step
            # (data/device_aug.py::make_device_augment_custom). Requires a
            # uniform-resolution dataset (static shapes under jit).
            return np.asarray(image, np.uint8), np.asarray(mask, np.int32)
        if self.mode == "train":
            image, mask = self._sync_transform(image, mask)
        elif self.mode == "val":
            image, mask = self._val_sync_transform(image, mask)
        else:
            assert self.mode == "testval"
        return np.asarray(image, np.uint8), np.asarray(mask, np.int32)

    def _sync_transform(self, img, mask):
        """reference:custom.py:123-164 (note: flip AFTER crop, unlike the
        other datasets; original-size mode resizes to base_size²)."""
        rng = self._rng
        if not self.keep_original_size:
            if self.multi_scale:
                scale = rng.choice(self.scales)
                w, h = img.size
                img = img.resize((int(w * scale), int(h * scale)), Image.BILINEAR)
                mask = mask.resize((int(w * scale), int(h * scale)), Image.NEAREST)
            w, h = img.size
            if w < self.crop_size or h < self.crop_size:
                nw, nh = max(w, self.crop_size), max(h, self.crop_size)
                img = img.resize((nw, nh), Image.BILINEAR)
                mask = mask.resize((nw, nh), Image.NEAREST)
            w, h = img.size
            x1 = rng.randint(0, w - self.crop_size)
            y1 = rng.randint(0, h - self.crop_size)
            img = img.crop((x1, y1, x1 + self.crop_size, y1 + self.crop_size))
            mask = mask.crop((x1, y1, x1 + self.crop_size, y1 + self.crop_size))
        else:
            img = img.resize((self.base_size, self.base_size), Image.BILINEAR)
            mask = mask.resize((self.base_size, self.base_size), Image.NEAREST)
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
            mask = mask.transpose(Image.FLIP_LEFT_RIGHT)
        return img, mask

    def _val_sync_transform(self, img, mask):
        if self.keep_original_size:
            img = img.resize((self.base_size, self.base_size), Image.BILINEAR)
            mask = mask.resize((self.base_size, self.base_size), Image.NEAREST)
        else:
            img, mask = self.tf.val(img, mask)
        return img, mask

    def __len__(self):
        return len(self.filenames)

    @property
    def num_class(self):
        return self.NUM_CLASS

    @property
    def pred_offset(self):
        return 0
