"""TuSimple lane demo — port of reference:demo_tusimple.py.

Single image or folder → binary lane mask → green overlay + side-by-side
panel; prints per-image lane coverage stats.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="TuSimple lane demo")
    parser.add_argument("--input", type=str, required=True, help="image file or folder")
    parser.add_argument("--weights-folder", default="./weights")
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--outdir", default="./test_result")
    parser.add_argument("--aux", action="store_true", default=False)
    parser.add_argument("--alpha", type=float, default=0.5)
    parser.add_argument("--max-images", type=int, default=None)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    from PIL import Image

    from fastscnn_tpu.engine import E2EConfig, IMAGENET_MEAN, IMAGENET_STD, InferenceEngine
    from fastscnn_tpu.models import FastSCNN, init_fast_scnn
    from fastscnn_tpu.perception import create_visualization
    from fastscnn_tpu.utils.checkpoint import load_pth_checkpoint

    model = FastSCNN(num_classes=2, aux=args.aux)
    weights = args.weights or os.path.join(args.weights_folder, "fast_scnn_tusimple.pth")
    if os.path.exists(weights):
        params, state = load_pth_checkpoint(weights, 2, aux=args.aux or None)
        print(f"loaded {weights}")
    else:
        print(f"warning: {weights} not found, using random init")
        params, state = init_fast_scnn(jax.random.PRNGKey(0), 2, args.aux)
    engine = InferenceEngine(
        model, params, state, config=E2EConfig(mean=IMAGENET_MEAN, std=IMAGENET_STD)
    )

    if os.path.isdir(args.input):
        files = [
            os.path.join(args.input, f)
            for f in sorted(os.listdir(args.input))
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        ]
        if args.max_images:
            files = files[: args.max_images]
    else:
        files = [args.input]

    os.makedirs(args.outdir, exist_ok=True)
    outputs = []
    for path in files:
        rgb = np.asarray(Image.open(path).convert("RGB"), np.uint8)
        pred = engine.predict(rgb)
        mask = (pred * 255).astype(np.uint8)
        bgr = rgb[:, :, ::-1].copy()
        overlay = create_visualization(bgr, mask, alpha=args.alpha)
        panel = np.concatenate([bgr, overlay], axis=1)
        base = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(args.outdir, f"{base}_lane_demo.jpg")
        Image.fromarray(panel[:, :, ::-1]).save(out_path)
        coverage = 100.0 * (pred > 0).mean()
        print(f"{base}: lane coverage {coverage:.2f}% -> {out_path}")
        outputs.append(out_path)
    return outputs


if __name__ == "__main__":
    main()
