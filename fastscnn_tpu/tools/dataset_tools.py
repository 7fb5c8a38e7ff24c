"""Dataset preparation utilities.

Ports of the reference's standalone scripts:

- ``augment_dataset``       — horizontal-flip dataset doubling
  (reference:augment_data.py:1-165)
- ``convert_lane_to_drivable`` — lane-line masks → filled between-lines
  drivable masks via morphology + per-row fill
  (reference:convert_lane_to_drivable.py:1-201)
- ``dedupe_images``         — MD5 content dedup of collected images
  (reference:fix_image_duplication.py:1-438)

Each has a function core (tested) and a CLI (``python -m
fastscnn_tpu.tools.dataset_tools <command> ...``).
"""

from __future__ import annotations

import argparse
import hashlib
import os

import numpy as np
from PIL import Image

__all__ = ["augment_dataset", "convert_lane_to_drivable_mask", "dedupe_images"]


def augment_dataset(images_dir: str, masks_dir: str, suffix: str = "_flipped") -> int:
    """Add a horizontally flipped copy of every image/mask pair. Returns the
    number of new pairs created."""
    created = 0
    for filename in sorted(os.listdir(images_dir)):
        base, ext = os.path.splitext(filename)
        if ext.lower() not in (".jpg", ".jpeg", ".png") or base.endswith(suffix):
            continue
        mask_path = os.path.join(masks_dir, base + ".png")
        if not os.path.exists(mask_path):
            continue
        out_img = os.path.join(images_dir, base + suffix + ext)
        out_mask = os.path.join(masks_dir, base + suffix + ".png")
        if os.path.exists(out_img):
            continue
        Image.open(os.path.join(images_dir, filename)).transpose(
            Image.FLIP_LEFT_RIGHT
        ).save(out_img)
        Image.open(mask_path).transpose(Image.FLIP_LEFT_RIGHT).save(out_mask)
        created += 1
    return created


def convert_lane_to_drivable_mask(
    lane_mask: np.ndarray, dilate_iterations: int = 2, min_lane_pixels: int = 2
) -> np.ndarray:
    """Lane-line mask (thin lines) → filled drivable-area mask.

    Per row: find the leftmost and rightmost lane pixels (after a dilation
    to bridge gaps) and fill between them — the reference's morphology +
    row-fill strategy (reference:convert_lane_to_drivable.py:1-31).
    """
    binary = (lane_mask > 0).astype(np.uint8)
    if dilate_iterations > 0:
        try:
            import cv2

            kernel = np.ones((3, 3), np.uint8)
            binary = cv2.dilate(binary, kernel, iterations=dilate_iterations)
        except Exception:
            for _ in range(dilate_iterations):
                padded = np.pad(binary, 1)
                binary = (
                    padded[:-2, 1:-1] | padded[2:, 1:-1] | padded[1:-1, :-2]
                    | padded[1:-1, 2:] | padded[1:-1, 1:-1]
                ).astype(np.uint8)
    out = np.zeros_like(binary)
    for y in range(binary.shape[0]):
        xs = np.flatnonzero(binary[y])
        if len(xs) >= min_lane_pixels:
            out[y, xs[0] : xs[-1] + 1] = 1
    return (out * 255).astype(np.uint8)


def dedupe_images(directory: str, delete: bool = False) -> dict:
    """MD5-based duplicate detection; optionally delete later copies.

    Returns {kept_path: [duplicate_paths...]}.
    """
    seen: dict[str, str] = {}
    duplicates: dict[str, list[str]] = {}
    for filename in sorted(os.listdir(directory)):
        path = os.path.join(directory, filename)
        if not os.path.isfile(path):
            continue
        digest = hashlib.md5(open(path, "rb").read()).hexdigest()
        if digest in seen:
            duplicates.setdefault(seen[digest], []).append(path)
            if delete:
                os.remove(path)
        else:
            seen[digest] = path
    return duplicates


def main(argv=None):
    parser = argparse.ArgumentParser(description="dataset tools")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("augment", help="horizontal-flip dataset doubling")
    p.add_argument("--images", required=True)
    p.add_argument("--masks", required=True)

    p = sub.add_parser("lane2drivable", help="lane masks -> drivable masks")
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--dilate", type=int, default=2)

    p = sub.add_parser("dedupe", help="MD5 image dedup")
    p.add_argument("--dir", required=True)
    p.add_argument("--delete", action="store_true")

    args = parser.parse_args(argv)
    if args.cmd == "augment":
        n = augment_dataset(args.images, args.masks)
        print(f"created {n} flipped pairs")
    elif args.cmd == "lane2drivable":
        os.makedirs(args.output_dir, exist_ok=True)
        n = 0
        for f in sorted(os.listdir(args.input_dir)):
            if not f.lower().endswith(".png"):
                continue
            mask = np.asarray(Image.open(os.path.join(args.input_dir, f)).convert("L"))
            out = convert_lane_to_drivable_mask(mask, dilate_iterations=args.dilate)
            Image.fromarray(out).save(os.path.join(args.output_dir, f))
            n += 1
        print(f"converted {n} masks")
    elif args.cmd == "dedupe":
        dups = dedupe_images(args.dir, delete=args.delete)
        total = sum(len(v) for v in dups.values())
        print(f"found {total} duplicates of {len(dups)} originals"
              + (" (deleted)" if args.delete else ""))


if __name__ == "__main__":
    main()
