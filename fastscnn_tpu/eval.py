"""Evaluation CLI — port of reference:eval.py.

Full-resolution (``testval``) evaluation at batch size 1 with per-sample
cumulative pixAcc/mIoU printing and colorized mask dumps to
``test_result/``. Variable native resolutions are handled with a
bucket-and-pad policy: images are right/bottom-padded to the next
multiple of ``--pad-multiple`` so jit recompilation happens per bucket,
not per image (the pad region is masked out of both metric and dump).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Fast-SCNN TPU evaluation")
    parser.add_argument("--dataset", type=str, default="citys",
                        choices=["citys", "tusimple", "bdd100k", "custom"])
    parser.add_argument("--data-root", type=str, default=None)
    parser.add_argument("--weights", type=str, default=None,
                        help=".pth checkpoint (defaults to weights/fast_scnn_<dataset>.pth)")
    parser.add_argument("--save-folder", type=str, default="./weights")
    parser.add_argument("--outdir", type=str, default="./test_result")
    parser.add_argument("--aux", action="store_true", default=False)
    parser.add_argument("--base-size", type=int, default=1024)
    parser.add_argument("--crop-size", type=int, default=768)
    parser.add_argument("--mode", type=str, default="testval", choices=["testval", "val"])
    parser.add_argument("--pad-multiple", type=int, default=64)
    parser.add_argument("--batch-size", type=int, default=1,
                        help="bucketed batching (same padded shape); >1 is a large "
                             "speedup on uniform-size val sets")
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--per-class", action="store_true", default=False,
                        help="print per-class IoU (reference:utils/metric.py compute_score)")
    parser.add_argument("--dtype", type=str, default="float32",
                        help="compute dtype for parity (float32) or speed (bfloat16)")
    parser.add_argument("--no-dump", action="store_true", default=False,
                        help="skip the per-image colorized PNG dumps (the metric-only "
                             "protocol; the reference always dumps, eval.py:44-60 — "
                             "on a 1-core host the PNG encode dominates wall time)")
    parser.add_argument("--decoded-cache", type=str, default=None,
                        help="decode-once image cache directory (data/decoded_cache.py) — "
                             "the measured eval protocol is host-decode-bound "
                             "(docs/PERFORMANCE.md 'Eval surface measured'); a warm "
                             "cache turns the per-image decode into a memcpy")
    return parser.parse_args(argv)


_DEFAULT_ROOTS = {
    "citys": "./datasets/citys",
    "tusimple": "./manideep1108/tusimple/versions/5/TUSimple",
    "bdd100k": "./bdd100k",
    "custom": "./data/custom",
}


class Evaluator:
    def __init__(self, args):
        import jax

        from fastscnn_tpu.data import get_segmentation_dataset
        from fastscnn_tpu.engine.infer import IMAGENET_MEAN, IMAGENET_STD
        from fastscnn_tpu.models import FastSCNN, init_fast_scnn
        from fastscnn_tpu.parallel import make_eval_step
        from fastscnn_tpu.utils.checkpoint import load_pth_checkpoint
        from fastscnn_tpu.utils.metric import SegmentationMetric

        self.args = args
        if getattr(args, "decoded_cache", None):
            from fastscnn_tpu.data import decoded_cache

            decoded_cache.set_cache_dir(args.decoded_cache)
        root = args.data_root or _DEFAULT_ROOTS[args.dataset]
        self.dataset = get_segmentation_dataset(
            args.dataset,
            root=root,
            split="val",
            mode=args.mode,
            base_size=args.base_size,
            crop_size=args.crop_size,
        )
        self.num_classes = self.dataset.num_class
        self.model = FastSCNN(num_classes=self.num_classes, aux=args.aux)
        weights = args.weights or os.path.join(
            args.save_folder, f"fast_scnn_{args.dataset}.pth"
        )
        if os.path.exists(weights):
            self.params, self.model_state = load_pth_checkpoint(
                weights, self.num_classes, aux=args.aux or None
            )
            print(f"loaded {weights}")
        else:
            print(f"warning: {weights} not found, using random init")
            self.params, self.model_state = init_fast_scnn(
                jax.random.PRNGKey(0), self.num_classes, args.aux
            )
        mean, std = (
            (IMAGENET_MEAN, IMAGENET_STD)
            if self.dataset.normalization == "imagenet"
            else (None, None)
        )
        import jax.numpy as jnp

        # per_sample_stats: the metric's sufficient statistics come out of
        # the same device program as the prediction, per image — the
        # per-image host recomputation they replace measured 431 ms/image
        # through this sandbox's relay (docs/PERFORMANCE.md "Eval surface")
        # uint8 masks back (≤255 classes always holds here): the
        # device→host mask transfer is the eval protocol's largest wire
        # cost on a tunneled device (8 MB → 2 MB per 1024×2048 image)
        self.eval_step = make_eval_step(
            self.model,
            self.num_classes,
            compute_dtype=jnp.dtype(args.dtype),
            mean=mean,
            std=std,
            per_sample_stats=True,
            pred_dtype=jnp.uint8 if self.num_classes <= 255 else jnp.int32,
        )
        self.metric = SegmentationMetric(self.num_classes)

    def _pad(self, img: np.ndarray):
        m = self.args.pad_multiple
        h, w = img.shape[:2]
        ph = (h + m - 1) // m * m
        pw = (w + m - 1) // m * m
        if (ph, pw) == (h, w):
            return img, h, w
        out = np.zeros((ph, pw, 3), img.dtype)
        out[:h, :w] = img
        return out, h, w

    def eval(self):
        """Bucketed-batch evaluation: samples are grouped by padded shape so
        uniform-size datasets (Cityscapes val is all 1024×2048) run at the
        full batch size with ONE compiled executable — the reference
        evaluates strictly at bs=1 (reference:eval.py:24)."""
        import jax.numpy as jnp

        from fastscnn_tpu.utils.visualize import get_color_pallete

        args = self.args
        os.makedirs(args.outdir, exist_ok=True)
        n = len(self.dataset)
        if args.max_images:
            n = min(n, args.max_images)
        bs = max(1, args.batch_size)
        self._done = 0

        def flush(shape, pending):
            """Run one padded batch and update metrics/dumps."""
            chunk = pending[:bs]
            del pending[: len(chunk)]
            # int8 targets up the wire (labels in [-1, 18] for every
            # supported dataset): 4× less upload; the device histogram
            # casts to i32 internally, so metrics are bit-identical
            tgt_dtype = np.int8 if self.num_classes <= 127 else np.int32
            batch_imgs = np.zeros((bs, *shape), np.uint8)
            batch_tgts = np.full((bs, *shape[:2]), -1, tgt_dtype)
            for row, (i, padded, mask, h, w) in enumerate(chunk):
                batch_imgs[row] = padded
                batch_tgts[row, :h, :w] = mask
            preds, stats = self.eval_step(
                self.params, self.model_state, jnp.asarray(batch_imgs), jnp.asarray(batch_tgts)
            )
            preds = np.asarray(preds)
            # (B,)-leading stats from the device program; pad rows beyond
            # the chunk carry all-ignore targets → zero contribution, and
            # are not read anyway. Identical integer math to the host
            # metric.update (the pad region is masked by target = -1).
            correct, labeled, inter, union = (np.asarray(s) for s in stats)
            for row, (i, _, mask, h, w) in enumerate(chunk):
                pred = preds[row, :h, :w]
                self.metric.update_stats(
                    correct[row], labeled[row], inter[row], union[row]
                )
                self._done += 1
                pix_acc, miou = self.metric.get()
                print(
                    f"sample {self._done}: pixAcc {pix_acc * 100:.3f}% mIoU {miou * 100:.3f}%"
                )
                if not getattr(args, "no_dump", False):
                    get_color_pallete(pred, args.dataset).save(
                        os.path.join(args.outdir, f"seg_{i}.png")
                    )

        # stream samples into per-shape accumulators (memory: O(bs × buckets))
        buckets: dict[tuple, list] = {}
        for i in range(n):
            img, mask = self.dataset[i]
            padded, h, w = self._pad(img)
            pending = buckets.setdefault(padded.shape, [])
            pending.append((i, padded, mask, h, w))
            if len(pending) >= bs:
                flush(padded.shape, pending)
        for shape, pending in buckets.items():
            while pending:
                flush(shape, pending)
        return self.metric.get()


_CITYS_CLASSES = (
    "road", "sidewalk", "building", "wall", "fence", "pole", "traffic light",
    "traffic sign", "vegetation", "terrain", "sky", "person", "rider", "car",
    "truck", "bus", "train", "motorcycle", "bicycle",
)


def main(argv=None):
    args = parse_args(argv)
    evaluator = Evaluator(args)
    pix_acc, miou = evaluator.eval()
    if args.per_class:
        ious = evaluator.metric.per_class_iou()
        names = _CITYS_CLASSES if args.dataset == "citys" else [
            f"class_{i}" for i in range(len(ious))
        ]
        for name, iou in zip(names, ious):
            print(f"  {name:<16s} IoU {iou * 100:6.2f}%")
    print(f"FINAL pixAcc {pix_acc * 100:.3f}% mIoU {miou * 100:.3f}%")


if __name__ == "__main__":
    main()
