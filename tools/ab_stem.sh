#!/usr/bin/env bash
# Interleaved A/B of the stem-conv implementations on the real TPU.
# (tools/ab_stem.sh — run from the repo root when jax.devices() is live.)
#
# Serving: BENCH_DW_IMPL ∈ {conv,taps} through bench.py (batch 128 only,
# two interleaved repeats — cross-run numbers drift with pool load, so
# only within-script ordering A/B/A/B is trustworthy; docs/PERFORMANCE.md
# "Measurement methodology").
#
# Training: the real Cityscapes recipe (19-class CE 768² bs16) through
# bench_train.py with BENCH_TRAIN_STEM ∈ {xla,tapbwd,taps}.
set -u
cd "$(dirname "$0")/.."

echo "== device mask parity across dw impls (gates the fps numbers) =="
timeout 1800 python tools/check_dw_impls.py --height 512 --width 1024 --batch 4

echo "== serving: folded dw impl (batch 128, 1024x2048 bf16) =="
for rep in 1 2; do
  for impl in conv taps pallas fused-ds fused-ds-mr; do
    echo "--- rep $rep dw_impl=$impl"
    BENCH_DW_IMPL=$impl BENCH_BATCHES=128 BENCH_TRIALS=3 timeout 1200 python bench.py
  done
done

echo "== training: stem impl (ce19 768^2 bs16 — the Cityscapes recipe) =="
for rep in 1 2; do
  for impl in xla tapbwd taps taps-packbn pallas; do
    echo "--- rep $rep stem_impl=$impl"
    BENCH_TRAIN_STEM=$impl BENCH_TRAIN_CLASSES=19 BENCH_TRAIN_LOSS=ce \
      BENCH_TRAIN_CROP=768 BENCH_TRAIN_BATCHES=16 BENCH_TRAIN_ITERS=20 \
      timeout 1200 python bench_train.py
  done
done

echo "== training: stem impl (dice2 480^2 bs128 — the headline config) =="
for rep in 1 2; do
  for impl in xla taps taps-packbn; do
    echo "--- rep $rep stem_impl=$impl"
    BENCH_TRAIN_STEM=$impl BENCH_TRAIN_BATCHES=128 BENCH_TRAIN_ITERS=20 \
      timeout 1200 python bench_train.py
  done
done

echo "== summary =="
# when driven by the watcher the full log lives here; harmless otherwise
python tools/ab_report.py /tmp/ab_stem_results.log 2>/dev/null || true
