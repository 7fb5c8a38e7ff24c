"""Numerical parity gate across serving backends.

Port of the reference's parity gate (reference:compare_pytorch_onnx.py:16-150,
reported 0.38% pixel mismatch between PyTorch and the E2E ONNX export):
runs the same images through

  1. the f32 eval-mode forward (ground truth),
  2. the bf16 BN-folded serving engine,
  3. optionally a StableHLO export artifact,
  4. optionally the reference PyTorch model (when torch + the reference
     repo are importable) fed the same weights,

and reports per-pair argmax-mask disagreement rates. The default gate is
the reference's published tolerance (0.5%).

Usage::

    python -m fastscnn_tpu.tools.compare_backends --dataset custom \
        --weights weights/fast_scnn_custom.pth --num-images 5
"""

from __future__ import annotations

import argparse
import os

import numpy as np

__all__ = ["compare_backends", "main"]


def compare_backends(
    model,
    params,
    state,
    images: np.ndarray,
    mean=None,
    std=None,
    export_path: str | None = None,
    torch_model=None,
):
    """Return {pair_name: mismatch_rate} over argmax masks."""
    import jax
    import jax.numpy as jnp

    from fastscnn_tpu.engine import E2EConfig, InferenceEngine

    results = {}
    masks = {}

    # 1. f32 eval-mode ground truth
    f32 = InferenceEngine(
        model, params, state, config=E2EConfig(mean=mean, std=std, compute_dtype="float32")
    )
    masks["f32"] = f32.predict(images)

    # 2. bf16 folded serving
    bf16 = InferenceEngine(
        model, params, state, config=E2EConfig(mean=mean, std=std, compute_dtype="bfloat16")
    )
    masks["bf16"] = bf16.predict(images)

    # 3. exported artifact — StableHLO, or an emitted .onnx evaluated by
    # onnxruntime when installed / the built-in numpy evaluator otherwise
    # (the reference's gate compares exactly its shipped ONNX artifact,
    # reference:compare_pytorch_onnx.py:88-112)
    if export_path and os.path.exists(export_path):
        if export_path.endswith(".onnx"):
            from fastscnn_tpu.engine.onnx_native import parse_onnx, run_onnx

            x = np.transpose(images, (0, 3, 1, 2)).astype(np.float32)
            try:
                import onnxruntime as ort

                sess = ort.InferenceSession(export_path)
                out = sess.run(None, {sess.get_inputs()[0].name: x})[0]
            except ImportError:
                with open(export_path, "rb") as f:
                    parsed = parse_onnx(f.read())
                out = next(iter(
                    run_onnx(parsed, {parsed.graph.inputs[0].name: x}).values()
                ))
            out = np.asarray(out)
            masks["onnx"] = out.argmax(1) if out.ndim == 4 else out
        else:
            from fastscnn_tpu.engine.export import load_exported

            out = np.asarray(load_exported(export_path)(images))
            masks["export"] = out.argmax(-1) if out.ndim == 4 else out

    # 4. reference torch model with the same weights
    if torch_model is not None:
        import torch

        x = images.astype(np.float32) / 255.0
        if mean is not None:
            x = (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
        with torch.no_grad():
            logits = torch_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))[0]
        masks["torch"] = logits.argmax(1).numpy()

    ref = masks["f32"]
    for name, mask in masks.items():
        if name == "f32":
            continue
        results[f"f32_vs_{name}"] = float((mask != ref).mean())
    if "torch" in masks:
        results["torch_vs_bf16"] = float((masks["torch"] != masks["bf16"]).mean())
    return results


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Backend parity gate")
    parser.add_argument("--dataset", type=str, default="custom",
                        choices=["citys", "tusimple", "bdd100k", "custom"])
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--aux", action="store_true", default=False)
    parser.add_argument("--num-images", type=int, default=4)
    parser.add_argument("--height", type=int, default=360)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--image-dir", type=str, default=None,
                        help="real images instead of random (resized to HxW)")
    parser.add_argument("--export-path", type=str, default=None)
    parser.add_argument("--tolerance", type=float, default=0.005,
                        help="max allowed mismatch rate (reference published 0.38%%)")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    from fastscnn_tpu.engine.infer import IMAGENET_MEAN, IMAGENET_STD
    from fastscnn_tpu.models import DATASET_NUM_CLASSES, FastSCNN, init_fast_scnn
    from fastscnn_tpu.utils.checkpoint import load_pth_checkpoint

    num_classes = DATASET_NUM_CLASSES[args.dataset]
    model = FastSCNN(num_classes=num_classes, aux=args.aux)
    if args.weights and os.path.exists(args.weights):
        params, state = load_pth_checkpoint(args.weights, num_classes, aux=args.aux or None)
    else:
        print("warning: random init")
        params, state = init_fast_scnn(jax.random.PRNGKey(0), num_classes, args.aux)

    if args.image_dir:
        from PIL import Image

        files = sorted(os.listdir(args.image_dir))[: args.num_images]
        images = np.stack(
            [
                np.asarray(
                    Image.open(os.path.join(args.image_dir, f))
                    .convert("RGB")
                    .resize((args.width, args.height)),
                    np.uint8,
                )
                for f in files
            ]
        )
    else:
        rng = np.random.default_rng(0)
        images = rng.integers(
            0, 256, (args.num_images, args.height, args.width, 3), dtype=np.uint8
        )

    mean, std = (None, None) if args.dataset == "custom" else (IMAGENET_MEAN, IMAGENET_STD)
    results = compare_backends(
        model, params, state, images, mean=mean, std=std, export_path=args.export_path
    )
    worst = 0.0
    for pair, rate in sorted(results.items()):
        print(f"{pair}: {rate * 100:.4f}% pixels differ")
        worst = max(worst, rate)
    if worst > args.tolerance:
        raise SystemExit(
            f"PARITY FAIL: worst mismatch {worst * 100:.3f}% > {args.tolerance * 100:.3f}%"
        )
    print(f"PARITY OK (worst {worst * 100:.4f}% <= {args.tolerance * 100:.3f}%)")
    return results


if __name__ == "__main__":
    main()
