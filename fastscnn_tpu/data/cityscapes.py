"""Cityscapes 19-class semantic segmentation dataset.

Port of reference:data_loader/cityscapes.py:13-207 with identical
pairing (``leftImg8bit`` ↔ ``gtFine_labelIds`` via directory walk),
34→19 trainId remapping, and augmentation. Emits uint8 HWC images
(device-side ImageNet normalization) and int32 masks with ignore=-1.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from fastscnn_tpu.data import decoded_cache
from fastscnn_tpu.data.transforms import SyncTransforms

__all__ = ["CitySegmentation"]

# labelId → trainId lookup for ids -1..33 (-1 and unlabeled ids → -1).
_VALID_CLASSES = (7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 31, 32, 33)
_KEY = np.full(35, -1, np.int32)
for train_id, label_id in enumerate(_VALID_CLASSES):
    _KEY[label_id + 1] = train_id


class CitySegmentation:
    BASE_DIR = "cityscapes"
    NUM_CLASS = 19
    normalization = "imagenet"
    # device-aug pad fill = remap of the reference's raw-0 pad (label 0
    # 'unlabeled' → ignore); see data/device_aug.py.
    DEVICE_AUG_PAD_LABEL = -1

    def __init__(
        self,
        root="./datasets/citys",
        split="train",
        mode=None,
        base_size=520,
        crop_size=480,
        rng=None,
        **kwargs,
    ):
        self.root = root
        self.split = split
        self.mode = mode if mode is not None else split
        self.tf = SyncTransforms(base_size, crop_size, rng=rng)
        self.images, self.mask_paths = _get_city_pairs(root, split)
        assert len(self.images) == len(self.mask_paths)
        if len(self.images) == 0:
            raise RuntimeError(f"Found 0 images in subfolders of: {root}")

    def _class_to_index(self, mask: np.ndarray) -> np.ndarray:
        values = np.unique(mask)
        assert values.min() >= -1 and values.max() <= 33, f"unexpected label ids {values}"
        return _KEY[mask.astype(np.int32) + 1]

    def __getitem__(self, index):
        img = decoded_cache.open_rgb(self.images[index])
        if self.mode == "test":
            return np.asarray(img, np.uint8), os.path.basename(self.images[index])
        mask = decoded_cache.open_image(self.mask_paths[index])
        if self.mode == "device-aug":
            # native resolution + remapped labels; the PSP aug chain runs
            # on device inside the jitted train step (data/device_aug.py)
            return np.asarray(img, np.uint8), self._class_to_index(np.asarray(mask, np.int32))
        if self.mode == "train":
            img, mask = self.tf.train(img, mask)
        elif self.mode == "val":
            img, mask = self.tf.val(img, mask)
        else:
            assert self.mode == "testval"
        return np.asarray(img, np.uint8), self._class_to_index(np.asarray(mask, np.int32))

    def __len__(self):
        return len(self.images)

    @property
    def num_class(self):
        return self.NUM_CLASS

    @property
    def pred_offset(self):
        return 0


def _get_city_pairs(folder: str, split: str = "train"):
    def get_path_pairs(img_folder, mask_folder):
        img_paths, mask_paths = [], []
        for root, _, files in os.walk(img_folder):
            for filename in sorted(files):
                if filename.endswith(".png"):
                    imgpath = os.path.join(root, filename)
                    foldername = os.path.basename(os.path.dirname(imgpath))
                    maskname = filename.replace("leftImg8bit", "gtFine_labelIds")
                    maskpath = os.path.join(mask_folder, foldername, maskname)
                    if os.path.isfile(maskpath):
                        img_paths.append(imgpath)
                        mask_paths.append(maskpath)
        return img_paths, mask_paths

    if split in ("train", "val"):
        return get_path_pairs(
            os.path.join(folder, "leftImg8bit", split), os.path.join(folder, "gtFine", split)
        )
    assert split == "trainval"
    ti, tm = get_path_pairs(
        os.path.join(folder, "leftImg8bit", "train"), os.path.join(folder, "gtFine", "train")
    )
    vi, vm = get_path_pairs(
        os.path.join(folder, "leftImg8bit", "val"), os.path.join(folder, "gtFine", "val")
    )
    return ti + vi, tm + vm
