#!/usr/bin/env python
"""Input-pipeline benchmark: can the host feed the device? (round-2
verdict: every training number was synthetic-fed — the loaders had never
been measured against the device step rate.)

Measures, from DISK-resident fixture sets at the two recipe shapes:

1. loader-only samples/s — decode + the full PSP augmentation
   (random scale/crop/flip/Gaussian-blur, reference:
   data_loader/cityscapes.py:115-150) through BOTH input pipelines:
   the threaded prefetch loader (data/loader.py) and the Grain
   multiprocess loader (data/grain_loader.py);
2. end-to-end training samples/s with the loader IN the loop (our real
   Trainer for one epoch), to put next to the synthetic-fed device
   rates (bench_train.py: ~420 samples/s CE-19 768², ~2,239 dice-2
   480² @ bs 128 on v5e).

Shapes mirror the two recipes, scaled by --full:
  citys  : Cityscapes-format PNGs at 1024×2048, base 1024 / crop 768
  custom : TuSimple-like JPEGs at 720×1280, base 520 / crop 480

Honesty notes the JSON carries: this sandbox exposes nproc CPU cores
(often 1) — multiprocess loader scaling and the absolute feed rate are
both bounded by that; per-core rates and the core count are reported so
the pod-host extrapolation (rate × cores) is explicit.

Usage::

    python bench_input.py [--workdir D] [--full]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np


def _make_custom_set(root, n, height, width, seed=0):
    """TuSimple-like JPEG scenes + binary PNG masks (data/custom.py)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "masks"), exist_ok=True)
    for i in range(n):
        img = rng.integers(0, 256, (height, width, 3), dtype=np.uint8)
        mask = np.zeros((height, width), np.uint8)
        lane_x = int(width * (0.3 + 0.4 * rng.random()))
        mask[:, lane_x : lane_x + 30] = 255
        Image.fromarray(img).save(os.path.join(root, "images", f"f{i:05d}.jpg"), quality=90)
        Image.fromarray(mask).save(os.path.join(root, "masks", f"f{i:05d}.png"))
    return root


def measure_loader(loader, n_epochs=1, warmup=2):
    """samples/s through a loader, excluding up to `warmup` leading
    batches (thread/process pool spin-up). Warmup shrinks when the
    fixture set yields few batches so small sets still measure
    (first execution returned 0.0 for a 3-batch Grain epoch because the
    fixed warmup swallowed every batch)."""
    stamps = [time.perf_counter()]
    counts = []
    for _ in range(n_epochs):
        for images, _targets in loader:
            stamps.append(time.perf_counter())
            counts.append(len(images))
    if not counts:
        return 0.0
    w = min(warmup, len(counts) - 1)
    dt = stamps[-1] - stamps[w]
    seen = sum(counts[w:])
    return seen / dt if dt > 0 else 0.0


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/bench_input_fixtures")
    p.add_argument("--full", action="store_true",
                   help="full-size fixture sets (1024x2048 citys); default scales down 2x")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--train-epochs", type=int, default=1,
                   help="end-to-end Trainer epochs per recipe (0 = skip)")
    args = p.parse_args()

    from fastscnn_tpu.data import DataLoader, get_segmentation_dataset
    from fastscnn_tpu.data.grain_loader import GrainDataLoader
    from fastscnn_tpu.tools.system_check import generate_dataset

    scale = 1 if args.full else 2
    recipes = {
        "citys_ce19": dict(
            dataset="citys", height=1024 // scale, width=2048 // scale,
            base_size=1024 // scale, crop_size=768 // scale, n=24,
            loss="ce", aux=True,
        ),
        "custom_dice2": dict(
            dataset="custom", height=720 // scale, width=1280 // scale,
            base_size=520 // scale, crop_size=480 // scale, n=48,
            loss="dice", aux=True,
        ),
    }

    ncores = os.cpu_count() or 1
    out = {"metric": "input_pipeline", "cpu_cores": ncores, "recipes": {}}
    for name, r in recipes.items():
        root = os.path.join(args.workdir, f"{r['dataset']}_{r['height']}")
        if not os.path.exists(root):
            if r["dataset"] == "citys":
                generate_dataset(root, n_train=r["n"], n_val=4,
                                 height=r["height"], width=r["width"], seed=1)
            else:
                _make_custom_set(root, r["n"], r["height"], r["width"])
        ds = get_segmentation_dataset(
            r["dataset"], root=root, split="train", mode="train",
            base_size=r["base_size"], crop_size=r["crop_size"],
        )
        row = {}
        threads = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                             num_workers=args.workers)
        row["threads_sps"] = round(measure_loader(threads, n_epochs=2), 2)

        # decode-once cache (data/decoded_cache.py): epoch 1 below fills it
        # (decode + write), epoch 2 measures the steady state every later
        # epoch of a real run sees — decode was measured at 54% of the
        # per-record cost, so this is the implemented "pre-decoded array
        # records" fix from the study.
        from fastscnn_tpu.data import decoded_cache

        cache_dir = os.path.join(args.workdir, f"decoded_{name}")
        decoded_cache.set_cache_dir(cache_dir)
        try:
            fill = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                              num_workers=args.workers)
            row["threads_cache_fill_sps"] = round(measure_loader(fill, n_epochs=1), 2)
            warm = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                              num_workers=args.workers)
            row["threads_cached_sps"] = round(measure_loader(warm, n_epochs=2), 2)
        finally:
            decoded_cache.set_cache_dir(None)
        try:
            grain = GrainDataLoader(ds, batch_size=args.batch_size, shuffle=True,
                                    seed=0, num_workers=args.workers, num_epochs=2)
            row["grain_sps"] = round(measure_loader(grain, n_epochs=1), 2)
        except Exception as e:  # grain missing / platform limits
            row["grain_sps"] = None
            row["grain_error"] = str(e)[:200]

        # device-aug mode (data/device_aug.py): the host's per-record work
        # drops to decode (or cache memcpy) + label remap — the aug chain
        # (PSP for citys/tusimple/bdd100k, the custom chain for custom)
        # runs inside the jitted train step. Loader-only rate here; the
        # device-side cost of the aug matmuls is bench_train.py --device-aug.
        ds_dev = get_segmentation_dataset(
            r["dataset"], root=root, split="train", mode="device-aug",
            base_size=r["base_size"], crop_size=r["crop_size"],
        )
        dev = DataLoader(ds_dev, batch_size=args.batch_size, shuffle=True,
                         num_workers=args.workers)
        row["threads_device_aug_sps"] = round(measure_loader(dev, n_epochs=2), 2)
        decoded_cache.set_cache_dir(cache_dir)
        try:
            devc = DataLoader(ds_dev, batch_size=args.batch_size, shuffle=True,
                              num_workers=args.workers)
            row["threads_device_aug_cached_sps"] = round(
                measure_loader(devc, n_epochs=2), 2)
        finally:
            decoded_cache.set_cache_dir(None)
        print(f"{name}: device-aug loader {row['threads_device_aug_sps']} "
              f"samples/s (decoded-cache warm "
              f"{row['threads_device_aug_cached_sps']})", file=sys.stderr)
        print(f"{name}: threads {row['threads_sps']} samples/s "
              f"(decoded-cache warm {row['threads_cached_sps']}), "
              f"grain {row['grain_sps']} samples/s "
              f"(crop {r['crop_size']}, bs {args.batch_size}, "
              f"{args.workers} workers, {ncores} cores)", file=sys.stderr)

        if args.train_epochs > 0:
            from fastscnn_tpu.train import Trainer, parse_args as targs

            flags = [
                "--dataset", r["dataset"], "--data-root", root,
                "--base-size", str(r["base_size"]), "--crop-size", str(r["crop_size"]),
                "--batch-size", str(args.batch_size),
                "--epochs", str(args.train_epochs),
                "--loss-type", r["loss"], "--no-val",
                "--num-workers", str(args.workers),
                "--save-folder", os.path.join(args.workdir, "w_" + name),
                "--save-epoch", "100000", "--print-interval", "100000",
            ] + (["--aux"] if r["aux"] else [])
            tr = Trainer(targs(flags))
            tr.train()  # epoch 0: pays the jit compile, not timed
            # steady state: time `train_epochs` more epochs, loader in
            # the loop, compile cache warm
            tr.args.start_epoch, tr.args.epochs = 1, 1 + args.train_epochs
            t0 = time.perf_counter()
            tr.train()
            wall = time.perf_counter() - t0
            steps = tr.iters_per_epoch * args.train_epochs
            row["e2e_train_sps"] = round(steps * args.batch_size / wall, 2)
            print(f"{name}: end-to-end train {row['e2e_train_sps']} samples/s "
                  f"({steps} steady-state steps)", file=sys.stderr)
            # same steady-state epochs with the decoded cache on
            # (pre-filled by the loader measurement above)
            decoded_cache.set_cache_dir(cache_dir)
            try:
                tr.args.start_epoch, tr.args.epochs = 1, 1 + args.train_epochs
                t0 = time.perf_counter()
                tr.train()
                wall = time.perf_counter() - t0
                row["e2e_train_cached_sps"] = round(
                    steps * args.batch_size / wall, 2)
            finally:
                decoded_cache.set_cache_dir(None)
            print(f"{name}: end-to-end train, decoded cache on: "
                  f"{row['e2e_train_cached_sps']} samples/s", file=sys.stderr)
            # device-aug + decoded cache composed (the full TPU-native
            # input story; new Trainer — the step program differs)
            decoded_cache.set_cache_dir(cache_dir)
            try:
                tr2 = Trainer(targs(flags + ["--device-aug"]))
                tr2.train()  # epoch 0 pays the compile
                tr2.args.start_epoch, tr2.args.epochs = 1, 1 + args.train_epochs
                t0 = time.perf_counter()
                tr2.train()
                wall = time.perf_counter() - t0
                row["e2e_train_device_aug_cached_sps"] = round(
                    steps * args.batch_size / wall, 2)
            finally:
                decoded_cache.set_cache_dir(None)
            print(f"{name}: end-to-end train, device aug + decoded cache: "
                  f"{row['e2e_train_device_aug_cached_sps']} samples/s",
                  file=sys.stderr)
        out["recipes"][name] = row

    print(json.dumps(out))


if __name__ == "__main__":
    main()
