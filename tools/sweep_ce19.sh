#!/usr/bin/env bash
# CE-19 Cityscapes-recipe training-throughput sweep (round-3 verdict
# item 5): batch × grad-accum × device-aug on the live chip, through
# bench_train.py (on-device fori_loop protocol; grad-accum runs bench
# the SHIPPED make_train_step via BENCH_TRAIN_GRAD_ACCUM).
#
# The recipe: 19-class OHEM-CE + aux, 768² crops (reference:train.py
# defaults). Reference has no published Cityscapes-recipe speed; the
# r3 shipping number to beat is 429 samples/s at bs16.
#
# One TPU process at a time — do not run concurrently with bench.py.
set -u
cd "$(dirname "$0")/.."

CE="BENCH_TRAIN_CLASSES=19 BENCH_TRAIN_LOSS=ce BENCH_TRAIN_CROP=768"

run() {  # run <extra-env...>
  echo "--- $*"
  env $CE "$@" BENCH_TRAIN_ITERS=20 timeout 1500 python bench_train.py
}

echo "== CE-19 768² batch sweep, no accumulation =="
run BENCH_TRAIN_BATCHES=16,24,32,48

echo "== grad-accum: same microbatch sizes, amortized update =="
run BENCH_TRAIN_BATCHES=64  BENCH_TRAIN_GRAD_ACCUM=2   # mb 32
run BENCH_TRAIN_BATCHES=64  BENCH_TRAIN_GRAD_ACCUM=4   # mb 16
run BENCH_TRAIN_BATCHES=96  BENCH_TRAIN_GRAD_ACCUM=3   # mb 32
run BENCH_TRAIN_BATCHES=128 BENCH_TRAIN_GRAD_ACCUM=4   # mb 32
run BENCH_TRAIN_BATCHES=128 BENCH_TRAIN_GRAD_ACCUM=8   # mb 16

echo "== device-aug arms (native 1024×2048 citys frames, PSP chain on device) =="
run BENCH_TRAIN_BATCHES=16 BENCH_TRAIN_DEVICE_AUG=1 \
    BENCH_TRAIN_SRC=1024x2048 BENCH_TRAIN_BASE=1024
run BENCH_TRAIN_BATCHES=64 BENCH_TRAIN_GRAD_ACCUM=4 BENCH_TRAIN_DEVICE_AUG=1 \
    BENCH_TRAIN_SRC=1024x2048 BENCH_TRAIN_BASE=1024

echo "== done =="
