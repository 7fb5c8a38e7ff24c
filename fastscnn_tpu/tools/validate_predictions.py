"""GT-vs-prediction validation tool.

Port of reference:validate_model_predictions.py:16-60: runs the model on
validation images using the exact training-side preprocessing (resize to
base_size, normalize), compares against ground-truth masks, and writes a
per-image report plus side-by-side GT|pred|diff panels.

Usage::

    python -m fastscnn_tpu.tools.validate_predictions --dataset custom \
        --data-root data/custom --weights weights/fast_scnn_custom.pth
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="validate model predictions vs GT")
    parser.add_argument("--dataset", type=str, default="custom",
                        choices=["citys", "tusimple", "bdd100k", "custom"])
    parser.add_argument("--data-root", type=str, required=True)
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--aux", action="store_true", default=False)
    parser.add_argument("--base-size", type=int, default=1024)
    parser.add_argument("--crop-size", type=int, default=768)
    parser.add_argument("--max-images", type=int, default=20)
    parser.add_argument("--outdir", type=str, default="./validation_results")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    from PIL import Image

    from fastscnn_tpu.data import get_segmentation_dataset
    from fastscnn_tpu.engine.infer import IMAGENET_MEAN, IMAGENET_STD
    from fastscnn_tpu.models import FastSCNN, init_fast_scnn
    from fastscnn_tpu.parallel import make_eval_step
    from fastscnn_tpu.utils.checkpoint import load_pth_checkpoint
    from fastscnn_tpu.utils.metric import SegmentationMetric

    dataset = get_segmentation_dataset(
        args.dataset,
        root=args.data_root,
        split="val",
        mode="val",
        base_size=args.base_size,
        crop_size=args.crop_size,
    )
    num_classes = dataset.num_class
    model = FastSCNN(num_classes=num_classes, aux=args.aux)
    if args.weights and os.path.exists(args.weights):
        params, state = load_pth_checkpoint(args.weights, num_classes, aux=args.aux or None)
    else:
        print("warning: random init")
        params, state = init_fast_scnn(jax.random.PRNGKey(0), num_classes, args.aux)
    mean, std = (
        (IMAGENET_MEAN, IMAGENET_STD) if dataset.normalization == "imagenet" else (None, None)
    )
    import jax.numpy as jnp

    eval_step = make_eval_step(model, num_classes, mean=mean, std=std)

    os.makedirs(args.outdir, exist_ok=True)
    metric = SegmentationMetric(num_classes)
    lines = ["image,pix_acc,miou"]
    n = min(len(dataset), args.max_images)
    for i in range(n):
        img, gt = dataset[i]
        pred, _ = eval_step(params, state, jnp.asarray(img[None]), jnp.asarray(gt[None]))
        pred = np.asarray(pred)[0]
        per = SegmentationMetric(num_classes)
        per.update(pred, gt)
        pa, miou = per.get()
        metric.update(pred, gt)
        lines.append(f"{i},{pa:.4f},{miou:.4f}")

        # GT | pred | diff panel
        scale = 255 // max(num_classes - 1, 1)
        gt_vis = np.where(gt < 0, 0, gt * scale).astype(np.uint8)
        pred_vis = (pred * scale).astype(np.uint8)
        diff = np.where((gt >= 0) & (pred != gt), 255, 0).astype(np.uint8)
        panel = np.concatenate([gt_vis, pred_vis, diff], axis=1)
        Image.fromarray(panel).save(os.path.join(args.outdir, f"val_{i}_panel.png"))

    pa, miou = metric.get()
    lines.append(f"OVERALL,{pa:.4f},{miou:.4f}")
    report = os.path.join(args.outdir, "validation_report.csv")
    with open(report, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"overall: pixAcc {pa * 100:.2f}% mIoU {miou * 100:.2f}% -> {report}")
    return pa, miou


if __name__ == "__main__":
    main()
