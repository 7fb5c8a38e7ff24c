"""End-to-end serving A/B: bf16 pointwise convs vs the fused int8
Pallas kernels (``folded_pw_impl`` ∈ {'int8-a8', 'int8-w8a8'}), at the
flagship shape, behind a mask-parity gate.

This is the decision step the round-2 verdict asked for ("decide int8
with data"): the PTQ accuracy study (docs/quant_study_r3.json) showed
the int8 value grid holds accuracy, the per-op A/B
(docs/ab_int8_pw_r3.json) showed the kernels beat bf16 XLA on the big
pw sites in isolation — this tool answers whether that survives the
whole serving graph, where XLA fuses the bf16 convs into their
neighbors and the int8 path must pay a quantize step on every kernel
input.

Protocol: the house on-device fori_loop throughput measurement
(InferenceEngine.throughput_fn — iteration-dependent, hoist-proof),
median of ``--trials`` runs, per batch size. The int8 engines are
calibrated on synthetic uint8 batches through the engine's own
preprocessing (per-site MinMax, models/quantize.py). The parity gate
reports mask agreement vs the bf16 engine on a held-out batch — int8
is a semantic change, so it can only ever be an opt-in fast mode
(like 'argmax-first'); the gate quantifies the cost next to the win.

Usage::

    python tools/ab_int8_e2e.py [--hw 1024x2048] [--batches 64,128]
        [--impls conv,int8-a8,int8-w8a8] [--iters 20] [--trials 3]
        [--out docs/ab_int8_e2e_r3.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_engine(model, params, state):
    from fastscnn_tpu.engine import (
        E2EConfig,
        IMAGENET_MEAN,
        IMAGENET_STD,
        InferenceEngine,
    )

    return InferenceEngine(
        model,
        params,
        state,
        config=E2EConfig(
            mean=IMAGENET_MEAN, std=IMAGENET_STD, compute_dtype="bfloat16",
            final_upsample="hybrid",
        ),
    )


def measure(engine, shape, iters, trials, rng):
    import jax

    x = jax.numpy.asarray(rng.integers(0, 256, size=shape, dtype=np.uint8))
    fn = engine.throughput_fn(x.shape, iters=iters)
    _ = np.asarray(fn(x))  # compile + warm
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        _ = np.asarray(fn(x))
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[len(times) // 2]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--hw", default="1024x2048")
    p.add_argument("--batches", default="64,128")
    p.add_argument("--impls", default="conv,int8-a8,int8-w8a8")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--calib-batch", type=int, default=2)
    p.add_argument("--gate-batch", type=int, default=2)
    p.add_argument("--num-classes", type=int, default=19)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax

    from fastscnn_tpu.models import (
        FastSCNN,
        calibrate_pw_scales,
        init_fast_scnn,
        quantized_model,
    )

    h, w = (int(v) for v in args.hw.split("x"))
    batches = [int(b) for b in args.batches.split(",")]
    impls = args.impls.split(",")
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}, {h}x{w}, impls {impls}", flush=True)

    model = FastSCNN(num_classes=args.num_classes)
    params, state = init_fast_scnn(jax.random.PRNGKey(0), args.num_classes)
    base = build_engine(model, params, state)

    # Calibrate once on synthetic uint8 batches through the engine's own
    # preprocessing (what deployment inputs look like to the pw sites).
    calib = [
        rng.integers(0, 256, size=(args.calib_batch, h, w, 3), dtype=np.uint8)
        for _ in range(2)
    ]
    scales = calibrate_pw_scales(
        model, base.folded, calib, preprocess=base._preprocess
    )
    print(f"calibrated {len(scales)} pw sites", flush=True)

    # Mask-parity gate batch (held out from calibration).
    gate_x = rng.integers(0, 256, size=(args.gate_batch, h, w, 3), dtype=np.uint8)
    gate_ref = base.predict(gate_x)

    results = {}
    for impl in impls:
        if impl == "conv":
            eng, agree = base, 1.0
        else:
            eng = build_engine(quantized_model(model, scales, impl), params, state)
            agree = float((eng.predict(gate_x) == gate_ref).mean())
        rows = {}
        for b in batches:
            try:
                dt = measure(eng, (b, h, w, 3), args.iters, args.trials, rng)
            except Exception as e:  # OOM etc. — record and continue
                print(f"  {impl} batch {b} failed: {e}", file=sys.stderr)
                rows[str(b)] = {"error": str(e)[:200]}
                continue
            rows[str(b)] = {"fps": round(b / dt, 1), "ms_iter": round(dt * 1e3, 3)}
            print(f"  {impl:10s} batch {b:4d}: {b / dt:8.1f} fps  "
                  f"mask-agree {agree:.4f}", flush=True)
        results[impl] = {"mask_agreement": round(agree, 5), "batches": rows}

    out = {
        "hw": args.hw, "iters": args.iters, "trials": args.trials,
        "num_classes": args.num_classes, "results": results,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
