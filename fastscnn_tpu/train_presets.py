"""Preset trainer entry points — ports of the reference's wrapper scripts.

Each preset invokes the main Trainer with the tuned flag set of the
corresponding reference script:

- tusimple        (reference:train_tusimple.py:15-30: base 512, crop 480,
                   bs 16, dice, aux, fp16)
- bdd100k         (reference:train_bdd100k.py: AdamW, epochs 80, bs 8,
                   lr 1e-3, sample-ratio 0.1, binary drivable)
- custom_scratch  (reference:train_custom_scratch.py:19-38: epochs 200,
                   wd 1e-5 for deliberate overfit)
- custom_finetune (reference:train_custom_finetune.py: resume from a
                   BDD100K checkpoint with shape-filtered partial load,
                   lr 1e-4, CE loss)

Usage::

    python -m fastscnn_tpu.train_presets tusimple [extra train.py flags]
    python -m fastscnn_tpu.train_presets custom_finetune \
        --resume weights/fast_scnn_bdd100k.pth
"""

from __future__ import annotations

import sys

PRESETS = {
    "tusimple": [
        "--dataset", "tusimple",
        "--base-size", "512",
        "--crop-size", "480",
        "--batch-size", "16",
        "--loss-type", "dice",
        "--aux",
        "--epochs", "100",
    ],
    "bdd100k": [
        "--dataset", "bdd100k",
        "--optimizer", "adamw",
        "--epochs", "80",
        "--batch-size", "8",
        "--lr", "1e-3",
        "--sample-ratio", "0.1",
        "--label-type", "binary",
        "--base-size", "640",
        "--crop-size", "480",
        "--loss-type", "dice",
        "--aux",
    ],
    "custom_scratch": [
        "--dataset", "custom",
        "--epochs", "200",
        "--weight-decay", "1e-5",
        "--loss-type", "dice",
        "--aux",
        "--base-size", "640",
        "--crop-size", "480",
    ],
    "custom_finetune": [
        "--dataset", "custom",
        "--lr", "1e-4",
        "--loss-type", "ce_plain",
        "--epochs", "50",
        "--base-size", "640",
        "--crop-size", "480",
    ],
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in PRESETS:
        raise SystemExit(f"usage: python -m fastscnn_tpu.train_presets {{{'|'.join(PRESETS)}}} [flags]")
    preset = argv.pop(0)
    from fastscnn_tpu.train import main as train_main

    # user-supplied flags come last so they override preset defaults
    train_main(PRESETS[preset] + argv)


if __name__ == "__main__":
    main()
