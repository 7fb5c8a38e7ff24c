#!/usr/bin/env bash
# BDD100K drivable-area recipe sweep (BASELINE.json config 4, the
# reference's second trainer: train_bdd100k.py — 2-class dice + aux,
# AdamW lr 1e-3, images at 360×640).
#
# Legs:
#   1. host-aug-fed 360×640 AdamW, batch 8 → the knee
#   2. --keep-original-size device-aug chain (native-res flip + blur on
#      device, data/device_aug.py make_device_augment_original) at the
#      same batches
#
# One TPU job at a time on this sandbox. Results append to $OUT.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-docs/sweep_bdd_r5.jsonl}
ITERS=${ITERS:-20}

run() {
  echo "### $*" >> "$OUT"
  env "$@" BENCH_TRAIN_ITERS=$ITERS python bench_train.py >> "$OUT" 2>/tmp/sweep_bdd_err.log \
    || echo "{\"error\": \"$* failed\"}" >> "$OUT"
  tail -1 "$OUT"
}

# leg 1: host-aug 360×640 AdamW dice-2
run BENCH_TRAIN_SIZE=360x640 BENCH_TRAIN_OPT=adamw BENCH_TRAIN_CLASSES=2 \
    BENCH_TRAIN_LOSS=dice BENCH_TRAIN_BATCHES=8,32,64,128,192

# leg 2: device-aug keep-original-size chain at the same resolution
run BENCH_TRAIN_SRC=360x640 BENCH_TRAIN_DEVICE_AUG=1 BENCH_TRAIN_AUG_CHAIN=original \
    BENCH_TRAIN_OPT=adamw BENCH_TRAIN_CLASSES=2 BENCH_TRAIN_LOSS=dice \
    BENCH_TRAIN_BATCHES=8,32,64,128,192

# control: SGD at the same size (isolates the optimizer's cost)
run BENCH_TRAIN_SIZE=360x640 BENCH_TRAIN_CLASSES=2 BENCH_TRAIN_LOSS=dice \
    BENCH_TRAIN_BATCHES=64,128
