#!/usr/bin/env python
"""Headline benchmark: Cityscapes-resolution (1024×2048) bf16 inference
throughput per chip, end-to-end (uint8-equivalent input, on-device
preprocessing, BN-folded weights, argmax mask).

Protocol: the timing loop runs ON DEVICE (``lax.fori_loop`` of full
forward passes inside one jitted program, synced by a scalar readback).
In this sandbox the TPU is reached through a relay that adds ~10 ms of
host overhead per dispatch; an in-graph loop amortizes that away and
measures what directly-attached serving would see. Median of 3 trials,
best over batch sizes.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps/chip", "vs_baseline": N}

Baseline (driver BASELINE.json north-star): 1e3 fps/chip at 1024×2048
bf16. Reference-published comparables: 81.4 FPS on a dev GPU (TuSimple
res), 71.9 FPS on Atlas 200 at 640×360 (BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np


def main():
    import jax

    from fastscnn_tpu.engine import E2EConfig, IMAGENET_MEAN, IMAGENET_STD, InferenceEngine
    from fastscnn_tpu.models import FastSCNN, init_fast_scnn

    h, w = 1024, 2048
    num_classes = 19

    # BENCH_DW_IMPL=taps A/Bs the LTD depthwise convs as VPU tap
    # accumulation (ops/conv.py::dw_conv2d_taps) against the default conv.
    model = FastSCNN(
        num_classes=num_classes,
        folded_dw_impl=os.environ.get("BENCH_DW_IMPL", "conv"),
    )
    params, state = init_fast_scnn(jax.random.PRNGKey(0), num_classes)
    # BENCH_UPSAMPLE A/Bs the final mask formulation (hybrid default;
    # 'nbr-exact', 'argmax-first', 'matmul', ... — see E2EConfig).
    engine = InferenceEngine(
        model,
        params,
        state,
        config=E2EConfig(
            mean=IMAGENET_MEAN, std=IMAGENET_STD, compute_dtype="bfloat16",
            final_upsample=os.environ.get("BENCH_UPSAMPLE", "hybrid"),
        ),
    )

    # Default sweep: 64 is the knee; 96/128 fit since the matmul-upsample
    # path stopped materializing full-res logits (128 is the best
    # measured: 1,309 fps vs 1,130 at 64) — a failed batch prints to
    # stderr and the sweep continues.
    batches = [int(b) for b in os.environ.get("BENCH_BATCHES", "64,96,128").split(",")]
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    trials = int(os.environ.get("BENCH_TRIALS", "5"))
    best_fps, best_batch = 0.0, 0
    best_eff = {}
    rng = np.random.default_rng(0)
    for batch in batches:
        x = jax.numpy.asarray(rng.integers(0, 256, size=(batch, h, w, 3), dtype=np.uint8))
        try:
            fn = engine.throughput_fn(x.shape, iters=iters)
            _ = np.asarray(fn(x))  # compile + warm
            times = []
            for _ in range(trials):
                t0 = time.perf_counter()
                _ = np.asarray(fn(x))
                times.append((time.perf_counter() - t0) / iters)
            dt = sorted(times)[len(times) // 2]
        except Exception as e:  # OOM at large batch etc.
            print(f"batch {batch} failed: {e}", file=sys.stderr)
            continue
        fps = batch / dt
        print(f"batch {batch}: {fps:.1f} fps ({1e3 * dt:.2f} ms/iter)", file=sys.stderr)
        if fps > best_fps:
            best_fps, best_batch = fps, batch
            # efficiency accounting from XLA's own cost model: the whole
            # program runs `iters` forwards, so per-iter flops = total/iters
            try:
                ca = fn.lower(x).compile().cost_analysis()
                ca = ca[0] if isinstance(ca, list) else ca
                best_eff = {
                    "achieved_tflops": round(ca.get("flops", 0.0) / iters / dt / 1e12, 2),
                    # v5e peak: 197 TFLOP/s bf16, 819 GB/s HBM
                    "mfu": round(ca.get("flops", 0.0) / iters / dt / 197e12, 4),
                    "hbm_gbps": round(
                        ca.get("bytes accessed", 0.0) / iters / dt / 1e9, 1
                    ),
                    # why single-digit MFU/HBM% is the honest ceiling here:
                    "roofline": "docs/PERFORMANCE.md#roofline-ledger",
                }
            except Exception as e:
                best_eff = {"cost_analysis_error": str(e)[:120]}
        profile_dir = os.environ.get("BENCH_PROFILE_DIR")
        if profile_dir:
            from fastscnn_tpu.utils.profiling import device_trace

            with device_trace(os.path.join(profile_dir, f"batch{batch}")):
                _ = np.asarray(fn(x))
            print(f"profile trace → {profile_dir}/batch{batch}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": f"cityscapes_{h}x{w}_bf16_e2e_inference_throughput",
                "value": round(best_fps, 1),
                "unit": "fps/chip",
                "vs_baseline": round(best_fps / 1000.0, 3),
                "batch": best_batch,
                "dw_impl": os.environ.get("BENCH_DW_IMPL", "conv"),
                **best_eff,
            }
        )
    )


if __name__ == "__main__":
    main()
