"""Training CLI — TPU-native port of reference:train.py.

Same user surface (flag names, defaults, checkpoint layout, validation
cadence, best-model selection) with a TPU-first execution model: one
jitted sharded train step (bf16 compute, f32 master weights, sync-BN,
gradient psum over the 'data' mesh axis), uint8 host→device transfer
with on-device normalization, per-iteration poly LR inside the step.

Usage::

    python -m fastscnn_tpu.train --dataset citys --base-size 1024 \
        --crop-size 768 --epochs 160 --batch-size 16 --loss-type ce
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    """Flag set mirroring reference:train.py:21-97 (plus bdd100k/custom
    passthroughs)."""
    parser = argparse.ArgumentParser(description="Fast-SCNN on TPU (JAX)")
    parser.add_argument("--model", type=str, default="fast_scnn")
    parser.add_argument("--dataset", type=str, default="citys",
                        choices=["citys", "tusimple", "bdd100k", "custom"])
    parser.add_argument("--data-root", type=str, default=None, help="dataset root folder")
    parser.add_argument("--base-size", type=int, default=1024)
    parser.add_argument("--crop-size", type=int, default=768)
    parser.add_argument("--train-split", type=str, default="train")
    parser.add_argument("--aux", action="store_true", default=False)
    parser.add_argument("--aux-weight", type=float, default=0.4)
    parser.add_argument("--epochs", type=int, default=160)
    parser.add_argument("--start_epoch", type=int, default=0)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--grad-accum", type=int, default=1,
                        help="split each batch into N sequential microbatches "
                             "inside the jitted step (activation memory / N; "
                             "torch-style accumulation: mean of microbatch "
                             "gradients, one optimizer update) — train "
                             "effective batches whose activations would OOM")
    parser.add_argument("--lr", type=float, default=1e-2)
    parser.add_argument("--momentum", type=float, default=0.9)
    parser.add_argument("--weight-decay", type=float, default=1e-4)
    parser.add_argument("--optimizer", type=str, default="sgd", choices=["sgd", "adamw"])
    parser.add_argument("--loss-type", type=str, default="dice",
                        choices=["dice", "focal_dice", "ce", "ce_plain"])
    parser.add_argument("--fp16", action=argparse.BooleanOptionalAction, default=True,
                        help="bf16 compute on TPU (kept for flag parity; "
                        "--no-fp16 trains in full f32)")
    parser.add_argument("--resume", type=str, default=None,
                        help=".pth (weights) or .npz (full state) checkpoint")
    parser.add_argument("--auto-resume", action="store_true", default=False,
                        help="resume from save-folder's latest train state if present "
                             "(preemption-safe restarts)")
    parser.add_argument("--save-folder", type=str, default="./weights")
    parser.add_argument("--tensorboard-dir", type=str, default=None,
                        help="also mirror epoch metrics as TensorBoard "
                             "scalars to this directory (the reference's "
                             "unchecked TODO, reference:README.md:62)")
    parser.add_argument("--eval", action="store_true", default=False)
    parser.add_argument("--no-val", action="store_true", default=False)
    parser.add_argument("--val-epoch", type=int, default=1, help="validate every N epochs")
    parser.add_argument("--save-epoch", type=int, default=10)
    parser.add_argument("--print-interval", type=int, default=10)
    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--loader", type=str, default="threads", choices=["threads", "grain"],
                        help="input pipeline: threaded prefetch (default) or Grain "
                             "(multiprocess workers, per-record deterministic aug)")
    parser.add_argument("--decoded-cache", type=str, default=None, metavar="DIR",
                        help="decode-once image cache directory (data/decoded_cache.py): "
                             "first epoch decodes and stores raw arrays, later epochs "
                             "skip PNG/JPEG decode — the measured 54%% of per-record "
                             "cost (docs/PERFORMANCE.md input-pipeline study)")
    parser.add_argument("--device-aug", action="store_true", default=False,
                        help="run the PSP augmentation chain on device inside the "
                             "jitted train step (data/device_aug.py): the host only "
                             "decodes (or memcpys from --decoded-cache) native-"
                             "resolution images; supported for citys/tusimple/"
                             "bdd100k standard train transform")
    parser.add_argument("--device-aug-split", action="store_true", default=False,
                        help="with --device-aug: compile the aug chain as its OWN "
                             "jitted program feeding the crop-fed train step (two "
                             "dispatches, donated native-res buffers) — sidesteps "
                             "the fused program's large-batch compile-memory wall "
                             "(docs/PERFORMANCE.md, bs96 `--device-aug`)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--stem-impl", type=str, default="xla",
                        choices=["xla", "tapbwd", "taps", "taps-packbn", "pallas"],
                        help="training-time impl of the small-C stem convs "
                             "(tapbwd = per-tap dW contractions; see docs/PERFORMANCE.md)")
    # bdd100k extras (reference:train_bdd100k.py)
    parser.add_argument("--subset", type=str, default="100k")
    parser.add_argument("--label-type", type=str, default="binary")
    parser.add_argument("--sample-ratio", type=float, default=1.0)
    parser.add_argument("--max-samples", type=int, default=None)
    parser.add_argument("--keep-original-size", action="store_true", default=False)
    parser.add_argument("--multi-scale", action="store_true", default=False)
    parser.add_argument("--experiment", action="store_true", default=False,
                        help="quick experiment mode: 5%% of the data, 20 epochs, bs 4 "
                             "(reference:train_bdd100k.py:99-107)")
    args = parser.parse_args(argv)
    if args.experiment:
        args.sample_ratio = 0.05
        args.epochs = 20
        args.batch_size = 4
        args.val_epoch = 2
        args.print_interval = 10
    return args


class _EpochChunker:
    """Adapts a multi-epoch Grain stream to the per-epoch iteration the
    trainer loop expects."""

    def __init__(self, loader, num_epochs):
        self._iter = iter(loader)
        self._per_epoch = len(loader) // max(num_epochs, 1)
        if self._per_epoch == 0 and len(loader):
            raise ValueError(
                f"loader yields {len(loader)} total batches for {num_epochs} "
                "epochs — fewer than one batch per epoch; reduce --epochs or "
                "--batch-size (silently training on nothing otherwise)"
            )

    def __len__(self):
        return self._per_epoch

    def __iter__(self):
        for _ in range(self._per_epoch):
            try:
                yield next(self._iter)
            except StopIteration:
                return


_DEFAULT_ROOTS = {
    "citys": "./datasets/citys",
    "tusimple": "./manideep1108/tusimple/versions/5/TUSimple",
    "bdd100k": "./bdd100k",
    "custom": "./data/custom",
}


class Trainer:
    def __init__(self, args):
        import jax
        import jax.numpy as jnp

        from fastscnn_tpu.data import DataLoader, get_segmentation_dataset
        from fastscnn_tpu.engine.infer import IMAGENET_MEAN, IMAGENET_STD
        from fastscnn_tpu.losses import get_loss_fn
        from fastscnn_tpu.models import FastSCNN
        from fastscnn_tpu.parallel import (
            create_train_state,
            make_eval_step,
            make_mesh_for_batch,
            make_optimizer,
            make_train_step,
        )
        from fastscnn_tpu.utils import lr_schedule
        from fastscnn_tpu.utils.checkpoint import load_pth_checkpoint, load_train_state
        from fastscnn_tpu.utils.monitor import TrainingMonitor

        self.args = args
        if getattr(args, "decoded_cache", None):
            from fastscnn_tpu.data import decoded_cache

            decoded_cache.set_cache_dir(args.decoded_cache)
        root = args.data_root or _DEFAULT_ROOTS[args.dataset]
        ds_kwargs = dict(root=root, base_size=args.base_size, crop_size=args.crop_size)
        if args.dataset == "bdd100k":
            ds_kwargs.update(
                subset=args.subset,
                label_type=args.label_type,
                sample_ratio=args.sample_ratio,
                max_samples=args.max_samples,
                keep_original_size=args.keep_original_size,
                multi_scale=args.multi_scale,
            )
        train_mode = "device-aug" if getattr(args, "device_aug", False) else "train"
        self.train_ds = get_segmentation_dataset(
            args.dataset, split=args.train_split, mode=train_mode, **ds_kwargs
        )
        if train_mode == "device-aug" and not hasattr(self.train_ds, "DEVICE_AUG_PAD_LABEL"):
            raise ValueError(
                f"--device-aug is not supported for dataset '{args.dataset}' "
                "(its augmentation chain differs from the standard PSP transform)"
            )
        self.val_ds = None
        if not args.no_val:
            val_kwargs = dict(ds_kwargs)
            if args.dataset == "bdd100k" and val_kwargs.get("sample_ratio", 1.0) < 1.0:
                # shrink validation like the reference (train_bdd100k.py:139-141)
                val_kwargs["sample_ratio"] = min(0.2, val_kwargs["sample_ratio"] * 2)
            self.val_ds = get_segmentation_dataset(
                args.dataset, split="val", mode="val", **val_kwargs
            )
        if args.loader == "grain":
            from fastscnn_tpu.data.grain_loader import GrainDataLoader

            self.train_loader = GrainDataLoader(
                self.train_ds,
                batch_size=args.batch_size,
                shuffle=True,
                drop_last=True,
                num_workers=args.num_workers,
                seed=args.seed,
                num_epochs=args.epochs,
            )
            # GrainDataLoader iterates num_epochs epochs in one stream; the
            # trainer loop re-enters per epoch, so wrap to chunk per epoch.
            self.train_loader = _EpochChunker(self.train_loader, args.epochs)
        else:
            self.train_loader = DataLoader(
                self.train_ds,
                batch_size=args.batch_size,
                shuffle=True,
                drop_last=True,
                num_workers=args.num_workers,
                seed=args.seed,
            )
        self.num_classes = self.train_ds.num_class

        if self.train_ds.normalization == "imagenet":
            mean, std = IMAGENET_MEAN, IMAGENET_STD
        else:
            mean, std = None, None

        self.model = FastSCNN(
            num_classes=self.num_classes, aux=args.aux,
            stem_impl=getattr(args, "stem_impl", "xla"),
        )
        self.iters_per_epoch = max(len(self.train_ds) // args.batch_size, 1)
        schedule = lr_schedule(
            "poly",
            base_lr=args.lr,
            nepochs=args.epochs,
            iters_per_epoch=self.iters_per_epoch,
            power=0.9,
        )
        self.schedule = schedule
        optimizer = make_optimizer(
            args.optimizer, schedule, momentum=args.momentum, weight_decay=args.weight_decay
        )
        self.mesh = make_mesh_for_batch(args.batch_size)
        self.state = create_train_state(
            self.model, optimizer, key=jax.random.PRNGKey(args.seed)
        )
        if args.auto_resume and not args.resume:
            candidate = os.path.join(args.save_folder, f"train_state_{args.dataset}.npz")
            if os.path.exists(candidate):
                args.resume = candidate
        resumed_run = False  # continuing the SAME run (full-state restore)?
        if args.resume:
            if args.resume.endswith(".npz"):
                self.state = load_train_state(args.resume, self.state)
                resumed_run = True
                # continue from the epoch implied by the restored step
                args.start_epoch = max(
                    args.start_epoch, int(self.state.step) // self.iters_per_epoch
                )
                print(f"resumed full train state from {args.resume} (step {int(self.state.step)})")
            else:
                params, mstate = load_pth_checkpoint(
                    args.resume, self.num_classes, aux=args.aux or None,
                    allow_shape_mismatch=True,
                )
                self.state = create_train_state(
                    self.model, optimizer, params=params, model_state=mstate
                )
                print(f"resumed weights from {args.resume}")

        loss_fn = get_loss_fn(
            args.loss_type,
            aux=args.aux,
            aux_weight=args.aux_weight,
            num_classes=self.num_classes,
        )
        import jax.numpy as jnp

        compute_dtype = jnp.bfloat16 if args.fp16 else jnp.float32
        device_aug = None
        if train_mode == "device-aug":
            chain = getattr(self.train_ds, "DEVICE_AUG_CHAIN", "psp")
            if chain == "original":
                # BDD100K --keep-original-size: flip + blur(p=0.3) at
                # native resolution (reference:bdd100k.py:242-259).
                from fastscnn_tpu.data.device_aug import make_device_augment_original

                device_aug = make_device_augment_original(
                    blur_p=0.3, compute_dtype=compute_dtype
                )
            elif chain == "custom":
                from fastscnn_tpu.data.device_aug import make_device_augment_custom

                device_aug = make_device_augment_custom(
                    crop_size=args.crop_size,
                    multi_scale=args.multi_scale,
                    scales=tuple(self.train_ds.scales),
                    keep_original_size=args.keep_original_size,
                    base_size=args.base_size,
                    compute_dtype=compute_dtype,
                )
            else:
                from fastscnn_tpu.data.device_aug import make_device_augment

                device_aug = make_device_augment(
                    base_size=args.base_size,
                    crop_size=args.crop_size,
                    pad_label=self.train_ds.DEVICE_AUG_PAD_LABEL,
                    compute_dtype=compute_dtype,
                )
        if device_aug is not None and getattr(args, "device_aug_split", False):
            from fastscnn_tpu.parallel import make_split_aug_train_step

            self.train_step = make_split_aug_train_step(
                self.model, loss_fn, optimizer, device_aug, mesh=self.mesh,
                mean=mean, std=std, compute_dtype=compute_dtype,
                grad_accum=args.grad_accum,
            )
        else:
            self.train_step = make_train_step(
                self.model, loss_fn, optimizer, mesh=self.mesh, mean=mean, std=std,
                compute_dtype=compute_dtype, grad_accum=args.grad_accum,
                device_aug=device_aug,
            )
        self.eval_step = make_eval_step(
            self.model, self.num_classes, mesh=None, mean=mean, std=std,
            compute_dtype=compute_dtype,
        )
        os.makedirs("logs", exist_ok=True)
        # Monitor history continues only when this is actually the same run
        # (full-state restore) — a weights-only .pth resume is transfer
        # learning and a missed --auto-resume probe is a fresh run.
        self.monitor = TrainingMonitor(
            f"logs/training_log_{args.dataset}.json",
            experiment_name=f"fast_scnn_{args.dataset}",
            resume=resumed_run,
            tensorboard_dir=args.tensorboard_dir,
        )
        self._rng_key = jax.random.PRNGKey(args.seed + 1)

    # -- loops ---------------------------------------------------------------
    def train(self):
        # The monitor owns a tf.summary writer when --tensorboard-dir is
        # set; close it even on KeyboardInterrupt / training exceptions.
        try:
            return self._train_loop()
        finally:
            self.monitor.close()

    def _train_loop(self):
        import jax
        import jax.numpy as jnp

        args = self.args
        for epoch in range(args.start_epoch, args.epochs):
            epoch_losses = []
            metrics = None
            t_epoch = time.time()
            t_data = 0.0
            t_last = time.time()
            # Device-aug paths ship NATIVE-resolution label maps; int8
            # is lossless for every supported dataset (labels in
            # [-1, 18]) and quarters both the host→device transfer and
            # the on-device residency of the largest batch buffer — the
            # binding resource at the bs96 device-aug HBM wall
            # (docs/PERFORMANCE.md "device-aug compile wall, attacked").
            # The aug emits int32 crops, so the loss sees i32 either way.
            tgt_dtype = (
                np.int8
                if getattr(args, "device_aug", False) and self.num_classes <= 127
                else None
            )
            for it, (images, targets) in enumerate(self.train_loader):
                t_data += time.time() - t_last
                self._rng_key, step_key = jax.random.split(self._rng_key)
                if tgt_dtype is not None:
                    targets = np.asarray(targets).astype(tgt_dtype)
                self.state, metrics = self.train_step(
                    self.state, jnp.asarray(images), jnp.asarray(targets), step_key
                )
                if (it + 1) % args.print_interval == 0:
                    loss = float(metrics["loss"])
                    epoch_losses.append(loss)
                    done = time.time() - t_epoch
                    sps = (it + 1) * args.batch_size / done
                    lr_now = float(self.schedule(int(self.state.step)))
                    print(
                        f"epoch {epoch} iter {it + 1}/{self.iters_per_epoch} "
                        f"loss {loss:.4f} lr {lr_now:.5f} {sps:.1f} samples/s "
                        f"(data {t_data / (it + 1) * 1e3:.0f} ms/iter)"
                    )
                t_last = time.time()
            if metrics is None:
                raise RuntimeError(
                    f"epoch {epoch} produced no batches — dataset smaller "
                    "than one batch with drop_last, or an exhausted loader"
                )
            epoch_loss = float(np.mean(epoch_losses)) if epoch_losses else float(metrics["loss"])
            sps = self.iters_per_epoch * args.batch_size / (time.time() - t_epoch)

            pix_acc = miou = None
            if self.val_ds is not None and (epoch + 1) % args.val_epoch == 0:
                pix_acc, miou = self.validation()
                print(f"epoch {epoch}: val pixAcc {pix_acc * 100:.3f}% mIoU {miou * 100:.3f}%")
            is_best = self.monitor.log_epoch(
                epoch,
                epoch_loss,
                float(self.schedule(int(self.state.step))),
                pix_acc=pix_acc,
                miou=miou,
                samples_per_sec=sps,
            )
            if is_best or (epoch + 1) % args.save_epoch == 0 or epoch == args.epochs - 1:
                self.save_checkpoint(is_best)
        self.monitor.plot_curves()
        print(self.monitor.report())
        return self.state

    def validation(self, max_batches: int | None = None):
        import jax.numpy as jnp

        from fastscnn_tpu.data import DataLoader
        from fastscnn_tpu.utils.metric import seg_scores_from_hist

        loader = DataLoader(self.val_ds, batch_size=1, num_workers=self.args.num_workers)
        totals = None
        for i, (images, targets) in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            _, stats = self.eval_step(
                self.state.params, self.state.model_state, jnp.asarray(images), jnp.asarray(targets)
            )
            stats = [np.asarray(s, np.int64) for s in stats]
            totals = stats if totals is None else [a + b for a, b in zip(totals, stats)]
        if totals is None:
            return 0.0, 0.0
        return seg_scores_from_hist(*totals)

    def save_checkpoint(self, is_best=False):
        from fastscnn_tpu.utils.checkpoint import save_pth_checkpoint, save_train_state

        args = self.args
        path = save_pth_checkpoint(
            self.state.params,
            self.state.model_state,
            args.save_folder,
            dataset=args.dataset,
            is_best=is_best,
        )
        save_train_state(
            self.state, os.path.join(args.save_folder, f"train_state_{args.dataset}.npz")
        )
        return path


def main(argv=None):
    args = parse_args(argv)
    trainer = Trainer(args)
    if args.eval:
        pix_acc, miou = trainer.validation()
        print(f"val pixAcc {pix_acc * 100:.3f}% mIoU {miou * 100:.3f}%")
        return
    trainer.train()


if __name__ == "__main__":
    main()
