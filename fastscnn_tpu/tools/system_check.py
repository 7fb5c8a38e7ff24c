"""End-to-end system check — one command that exercises the whole stack.

Generates a synthetic 19-class dataset in Cityscapes format (real
``leftImg8bit``/``gtFine_labelIds`` tree → exercises the Cityscapes
loader and 34→19 remap), trains Fast-SCNN through the real Trainer
(OHEM CE + class weights + aux, sharded step, bf16) on whatever
accelerator is attached, saves a reference-dialect ``.pth``, evaluates
pixAcc/mIoU through the real Evaluator (bucketed batching), and — when
the reference repo and torch are importable — strict-loads the
checkpoint into the reference PyTorch model and verifies mask/metric
agreement.

Usage::

    python -m fastscnn_tpu.tools.system_check [--epochs 8] [--quick]
"""

from __future__ import annotations

import argparse
import os
import tempfile

import numpy as np

# The 19 valid Cityscapes labelIds (train ids 0..18).
_VALID = (7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 31, 32, 33)


def generate_dataset(root: str, n_train=24, n_val=4, height=128, width=256, seed=0):
    """Synthetic scenes: horizontal bands of classes, each class with a
    distinctive (noisy) color — learnable but not trivial."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    palette = rng.integers(30, 226, (19, 3))
    for split, count in (("train", n_train), ("val", n_val)):
        img_dir = os.path.join(root, "leftImg8bit", split, "synth")
        lbl_dir = os.path.join(root, "gtFine", split, "synth")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lbl_dir, exist_ok=True)
        for i in range(count):
            img = np.zeros((height, width, 3), np.float64)
            lbl = np.zeros((height, width), np.uint8)
            n_bands = rng.integers(3, 7)
            edges = np.sort(rng.choice(np.arange(8, height - 8), n_bands - 1, replace=False))
            edges = np.concatenate([[0], edges, [height]])
            classes = rng.choice(19, n_bands, replace=False)
            for b in range(n_bands):
                sl = slice(edges[b], edges[b + 1])
                img[sl] = palette[classes[b]]
                lbl[sl] = _VALID[classes[b]]
            img += rng.normal(0, 18, img.shape)
            # a few ignore blobs (labelId 0 = unlabeled → trainId -1)
            for _ in range(2):
                y = rng.integers(0, height - 12)
                x = rng.integers(0, width - 12)
                lbl[y : y + 12, x : x + 12] = 0
            Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
                os.path.join(img_dir, f"synth_{i:06d}_leftImg8bit.png")
            )
            Image.fromarray(lbl).save(
                os.path.join(lbl_dir, f"synth_{i:06d}_gtFine_labelIds.png")
            )
    return root


def main(argv=None):
    parser = argparse.ArgumentParser(description="fastscnn-tpu end-to-end system check")
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument("--quick", action="store_true", help="2 epochs, skip torch cross-check")
    parser.add_argument("--workdir", type=str, default=None)
    args = parser.parse_args(argv)
    if args.quick:
        args.epochs = 2

    # abspath before chdir: a relative --workdir would otherwise make the
    # just-built data_root resolve to workdir/workdir/citys
    workdir = os.path.abspath(args.workdir or tempfile.mkdtemp(prefix="fastscnn_syscheck_"))
    data_root = generate_dataset(os.path.join(workdir, "citys"))
    os.chdir(workdir)
    print(f"[1/6] synthetic 19-class Cityscapes-format dataset at {data_root}")

    import jax

    print(f"      devices: {jax.devices()}")

    from fastscnn_tpu.train import Trainer, parse_args as train_args

    trainer = Trainer(
        train_args(
            [
                "--dataset", "citys",
                "--data-root", data_root,
                "--base-size", "128",
                "--crop-size", "96",
                "--epochs", str(args.epochs),
                "--batch-size", "8",
                "--lr", "0.05",
                "--loss-type", "ce",  # OHEM + Cityscapes class weights
                "--aux",
                "--val-epoch", "1000",
                "--save-epoch", "1000",
                "--print-interval", "1000",
                "--num-workers", "2",
            ]
        )
    )
    print(f"[2/6] training {args.epochs} epochs (OHEM CE + aux, bf16, sharded step)...")
    trainer.train()
    ckpt = trainer.save_checkpoint()
    print(f"      checkpoint: {ckpt}")

    from fastscnn_tpu.eval import Evaluator, parse_args as eval_args

    evaluator = Evaluator(
        eval_args(
            [
                "--dataset", "citys",
                "--data-root", data_root,
                "--weights", ckpt,
                "--mode", "testval",
                "--batch-size", "4",
                "--aux",
                "--outdir", os.path.join(workdir, "test_result"),
            ]
        )
    )
    pix_acc, miou = evaluator.eval()
    print(f"[3/6] eval: pixAcc {pix_acc * 100:.2f}% mIoU {miou * 100:.2f}%")
    # quick mode runs too few steps to converge; gate accuracy only on full runs
    ok = True if args.quick else pix_acc > 0.6
    if not ok:
        print("      WARNING: pixAcc below 60% — training did not converge as expected")

    cross = "skipped"
    if not args.quick:
        try:
            import sys

            import torch

            ref_root = os.environ.get("REFERENCE_ROOT", "/root/reference")
            sys.path.insert(0, ref_root)
            from models.fast_scnn import FastSCNN as TorchFastSCNN

            sys.path.remove(ref_root)
            tmodel = TorchFastSCNN(19, aux=True)
            tmodel.load_state_dict(torch.load(ckpt, weights_only=False))
            tmodel.eval()

            from fastscnn_tpu.data import get_segmentation_dataset
            from fastscnn_tpu.engine import E2EConfig, IMAGENET_MEAN, IMAGENET_STD, InferenceEngine
            from fastscnn_tpu.models import FastSCNN
            from fastscnn_tpu.utils.checkpoint import load_pth_checkpoint

            params, state = load_pth_checkpoint(ckpt, 19, aux=True)
            engine = InferenceEngine(
                FastSCNN(num_classes=19, aux=True),
                params,
                state,
                config=E2EConfig(mean=IMAGENET_MEAN, std=IMAGENET_STD, compute_dtype="float32"),
            )
            ds = get_segmentation_dataset(
                "citys", root=data_root, split="val", mode="testval"
            )
            mismatches = []
            for i in range(min(3, len(ds))):
                img, _ = ds[i]
                ours = engine.predict(img)
                x = ((img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)
                with torch.no_grad():
                    logits = tmodel(torch.from_numpy(np.transpose(x[None], (0, 3, 1, 2))))[0]
                theirs = logits.argmax(1).numpy()[0]
                mismatches.append(float((ours != theirs).mean()))
            worst = max(mismatches)
            cross = f"worst mask mismatch {worst * 100:.3f}%"
            ok = ok and worst < 0.005
        except Exception as e:  # reference/torch unavailable
            cross = f"unavailable ({type(e).__name__}: {e})"
    print(f"[4/6] reference torch cross-check: {cross}")

    # export the E2E graph and run the perception pipeline on the artifact
    try:
        import jax.numpy as jnp

        from fastscnn_tpu.engine import E2EConfig, IMAGENET_MEAN, IMAGENET_STD, InferenceEngine
        from fastscnn_tpu.engine.export import export_stablehlo, load_exported
        from fastscnn_tpu.models import FastSCNN
        from fastscnn_tpu.utils.checkpoint import load_pth_checkpoint

        params, state = load_pth_checkpoint(ckpt, 19, aux=True)
        engine = InferenceEngine(
            FastSCNN(num_classes=19, aux=True),
            params,
            state,
            config=E2EConfig(mean=IMAGENET_MEAN, std=IMAGENET_STD, compute_dtype="bfloat16"),
        )
        shape = (1, 360, 640, 3)
        path = export_stablehlo(
            engine.predict_fn(shape),
            [jax.ShapeDtypeStruct(shape, jnp.uint8)],
            os.path.join(workdir, "model.stablehlo"),
        )
        artifact = load_exported(path)
        print(f"[5/6] StableHLO export ok ({os.path.getsize(path)} bytes)")

        from fastscnn_tpu.pipeline import inference_single_image

        class ArtifactSession:
            def infer(self, feeds):
                x = np.transpose(np.asarray(feeds[0]), (0, 2, 3, 1)).astype(np.uint8)
                mask = np.asarray(artifact(x))  # (1, H, W) argmax ids
                # expose as binary drivable logits for the planner (class 0 vs rest)
                logits = np.zeros((1, 2, mask.shape[1], mask.shape[2]), np.float32)
                logits[0, 1] = np.where(mask[0] > 0, 5.0, -5.0)
                return [logits]

        frame = np.zeros((360, 640, 3), np.uint8)
        frame[180:, :] = 120
        result = inference_single_image(
            frame, ArtifactSession(), edge_computing=True, output_dir=os.path.join(workdir, "out")
        )
        cr = result.get("control_result")
        assert cr is not None and -1000 <= cr["pwm_left"] <= 1000
        print(
            f"[6/6] perception pipeline on the exported artifact: "
            f"PWM L {cr['pwm_left']:+.0f} R {cr['pwm_right']:+.0f} ({cr['turn_direction']})"
        )
    except Exception as e:
        print(f"[5-6/6] export/pipeline stage FAILED: {type(e).__name__}: {e}")
        ok = False

    print("SYSTEM CHECK:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
