"""Single-image demo CLI — port of reference:demo.py.

Image → jitted forward → argmax → palette PNG.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Fast-SCNN TPU demo")
    parser.add_argument("--model", type=str, default="fast_scnn")
    parser.add_argument("--dataset", type=str, default="citys",
                        choices=["citys", "tusimple", "bdd100k", "custom"])
    parser.add_argument("--weights-folder", default="./weights")
    parser.add_argument("--input-pic", type=str, required=True)
    parser.add_argument("--outdir", default="./test_result")
    parser.add_argument("--aux", action="store_true", default=False)
    parser.add_argument("--cpu", action="store_true", default=False,
                        help="force CPU (flag parity with the reference's --cpu)")
    return parser.parse_args(argv)


def demo(argv=None):
    args = parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    from PIL import Image

    from fastscnn_tpu.engine import E2EConfig, IMAGENET_MEAN, IMAGENET_STD, InferenceEngine
    from fastscnn_tpu.models import DATASET_NUM_CLASSES, FastSCNN, init_fast_scnn
    from fastscnn_tpu.utils.checkpoint import load_pth_checkpoint
    from fastscnn_tpu.utils.visualize import get_color_pallete

    num_classes = DATASET_NUM_CLASSES[args.dataset]
    model = FastSCNN(num_classes=num_classes, aux=args.aux)
    weights = os.path.join(args.weights_folder, f"fast_scnn_{args.dataset}.pth")
    if os.path.exists(weights):
        params, state = load_pth_checkpoint(weights, num_classes, aux=args.aux or None)
    else:
        print(f"warning: {weights} not found, using random init")
        params, state = init_fast_scnn(jax.random.PRNGKey(0), num_classes, args.aux)

    mean, std = (IMAGENET_MEAN, IMAGENET_STD) if args.dataset != "custom" else (None, None)
    engine = InferenceEngine(model, params, state, config=E2EConfig(mean=mean, std=std))

    image = np.asarray(Image.open(args.input_pic).convert("RGB"), np.uint8)
    pred = engine.predict(image)
    os.makedirs(args.outdir, exist_ok=True)
    outname = os.path.splitext(os.path.basename(args.input_pic))[0] + ".png"
    out_path = os.path.join(args.outdir, outname)
    get_color_pallete(pred, args.dataset).save(out_path)
    print(f"saved {out_path}")
    return out_path


if __name__ == "__main__":
    demo()
