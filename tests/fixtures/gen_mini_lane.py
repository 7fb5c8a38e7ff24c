"""Generator for the committed mini lane-segmentation fixture set.

Deterministic synthetic "lane" images for the cross-framework
training-parity harness (tests/test_training_parity.py): dark noisy
background, one bright curved band per image, binary mask = the band.
The signal is deliberately easy (brightness-separable) so a few hundred
SGD steps converge to >0.9 lane IoU — the convergence-smoke gate.

Run ``python tests/fixtures/gen_mini_lane.py`` to (re)write
``mini_lane.npz`` next to this file. The npz is committed so the parity
tests do not depend on generator drift.
"""

from __future__ import annotations

import os

import numpy as np

N, H, W, SEED = 24, 64, 96, 7


def generate(n: int = N, h: int = H, w: int = W, seed: int = SEED):
    rng = np.random.default_rng(seed)
    images = np.empty((n, h, w, 3), np.uint8)
    masks = np.empty((n, h, w), np.uint8)
    ys = np.arange(h, dtype=np.float64)
    xs = np.arange(w, dtype=np.float64)
    for i in range(n):
        img = rng.integers(0, 90, (h, w, 3)).astype(np.uint8)
        # One curved bright band per image: quadratic centerline + varying width.
        c0 = rng.uniform(0.25, 0.75) * w
        tilt = rng.uniform(-0.3, 0.3) * w
        bend = rng.uniform(-0.4, 0.4) * w
        # Width ≥ 2 px at the model's 1/8 feature resolution: thinner bands
        # cap the learnable IoU near 0.87 from upsample boundary precision
        # alone, blurring the convergence gate's signal.
        width = rng.uniform(16.0, 26.0)
        t = ys / h - 0.5
        center = c0 + tilt * t + bend * t * t
        band = np.abs(xs[None, :] - center[:, None]) < (width / 2.0)
        bright = rng.integers(170, 250, (h, w, 3)).astype(np.uint8)
        img = np.where(band[..., None], bright, img)
        images[i] = img
        masks[i] = band.astype(np.uint8)
    return images, masks


def fixture_path() -> str:
    return os.path.join(os.path.dirname(__file__), "mini_lane.npz")


def load():
    data = np.load(fixture_path())
    return data["images"], data["masks"]


if __name__ == "__main__":
    images, masks = generate()
    np.savez_compressed(fixture_path(), images=images, masks=masks)
    print(f"wrote {fixture_path()}: images {images.shape} masks {masks.shape} "
          f"lane frac {masks.mean():.3f}")
