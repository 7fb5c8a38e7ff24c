#!/usr/bin/env python
"""Single-frame latency + realtime loop-rate benchmark (companion to
bench.py's batch-throughput numbers).

The reference's downstream point is a realtime control loop, not batch
throughput: Atlas 200 E2E inference 13.9 ms / 71.9 FPS at 640x360 fp16
(reference:ATLAS_DEPLOYMENT_GUIDE.md:5-9,179-196) and an 8-30 FPS SLO
for the driving loop (reference:monitor_8fps_performance.py:12-30).
This publishes the TPU-side equivalents:

1. device-loop batch-1 latency: one jitted program runs the full E2E
   mask graph in an on-device fori_loop (each iteration data-depends on
   the last — see InferenceEngine.throughput_fn for why). This is the
   per-frame latency a directly-attached host observes; it amortizes
   away the ~10 ms/call axon-relay dispatch this sandbox pays.
2. host-visible predict() latency: median wall time of single-frame
   predict() calls including transfers — RELAY-CAVEATED: on this
   sandbox every dispatch crosses an HTTP tunnel; on a directly
   attached TPU the dispatch overhead is ~100x smaller.
3. RealtimePipeline loop rate with a SyntheticCamera at 640x360 and the
   per-stage breakdown (preprocess/inference/postprocess/BEV/planning/
   control — the reference's times_dict analog,
   reference:kuruma/core/inference.py:71-91).

Prints one JSON line with all three.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np


def device_loop_latency(engine, shape, iters=50):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
    bench = engine.throughput_fn(shape, iters=iters)
    np.asarray(bench(x))  # compile + first run
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(bench(x))
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[1]


def host_predict_latency(engine, shape, calls=30):
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, shape, dtype=np.uint8)
    engine.predict(x)  # compile
    times = []
    for _ in range(calls):
        t0 = time.perf_counter()
        engine.predict(x)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def realtime_loop(engine, frames=40, width=640, height=360):
    from fastscnn_tpu.interfaces.realtime import RealtimePipeline, SyntheticCamera

    cam = SyntheticCamera(width=width, height=height, n_frames=frames + 5)
    pipe = RealtimePipeline(engine, cam, edge_computing=True)
    # warm up (compiles the .infer() logits graph)
    for _ in range(5):
        pipe.step()
    stage_totals: dict[str, float] = {}
    t0 = time.perf_counter()
    n = 0
    while n < frames and pipe.step():
        n += 1
    wall = time.perf_counter() - t0
    # per-stage breakdown from the last step's PerfTimer (steady state)
    last = pipe.web_data.get("frame_time_ms")
    return {
        "fps": round(n / wall, 1),
        "frame_time_ms": round(wall / max(n, 1) * 1e3, 2),
        "last_frame_ms": round(last, 2) if last else None,
        "frames": n,
    }


def realtime_stage_breakdown(engine, width=640, height=360, frames=20):
    """Average per-stage ms over `frames` steady-state pipeline runs,
    with the REALTIME loop's configuration (edge_computing → BEV pixel
    density 1 px/unit like RealtimePipeline._adjusted_ppu, device-mask
    fast path on) — the one-shot CLI's ppu-20 survey render is a
    different, offline surface."""
    from fastscnn_tpu.pipeline import inference_single_image

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (height, width, 3), dtype=np.uint8)
    kw = dict(pixels_per_unit=1, edge_computing=True)
    inference_single_image(img, engine, **kw)  # compile
    totals: dict[str, float] = {}
    for _ in range(frames):
        r = inference_single_image(img, engine, **kw)
        for k, v in r["perf"].times.items():
            totals[k] = totals.get(k, 0.0) + v
    return {k: round(v / frames * 1e3, 2) for k, v in totals.items()}


def main():
    import jax

    from fastscnn_tpu.engine import E2EConfig, InferenceEngine
    from fastscnn_tpu.models import FastSCNN, init_fast_scnn

    model = FastSCNN(num_classes=19, aux=False)
    params, state = init_fast_scnn(jax.random.PRNGKey(0), 19, aux=False)
    engine = InferenceEngine(model, params, state, config=E2EConfig(compute_dtype="bfloat16"))

    out = {"metric": "single_frame_latency", "unit": "ms", "relay_note": "host numbers cross the axon HTTP tunnel (~10 ms/dispatch); device-loop numbers amortize it"}
    for name, shape in (("1024x2048", (1, 1024, 2048, 3)), ("640x360", (1, 360, 640, 3))):
        dev = device_loop_latency(engine, shape)
        host = host_predict_latency(engine, shape)
        out[f"device_loop_ms_{name}"] = round(dev * 1e3, 2)
        out[f"host_predict_ms_{name}"] = round(host * 1e3, 2)
        print(
            f"batch-1 {name}: device-loop {dev * 1e3:.2f} ms/frame "
            f"({1 / dev:.1f} fps), host predict() {host * 1e3:.2f} ms",
            file=sys.stderr,
        )

    # Lane model (2-class, like the reference's deployed 640x360 OM)
    model2 = FastSCNN(num_classes=2, aux=False)
    p2, s2 = init_fast_scnn(jax.random.PRNGKey(0), 2, aux=False)
    engine2 = InferenceEngine(model2, p2, s2, config=E2EConfig(compute_dtype="bfloat16"))
    loop = realtime_loop(engine2)
    stages = realtime_stage_breakdown(engine2)
    out["realtime_loop"] = loop
    out["realtime_stage_ms"] = stages
    out["value"] = out["device_loop_ms_1024x2048"]
    print(f"realtime loop 640x360 (2-class): {loop}", file=sys.stderr)
    print(f"stage breakdown (ms): {stages}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
