"""Benchmark the eval surface — eval.py's testval protocol on the chip.

The eval protocol (reference:eval.py:14-62 → fastscnn_tpu/eval.py) is its
own performance surface, distinct from serving: native-resolution
bucket-and-pad batching, per-image host metric update, per-image PNG
dumps, and one jit compile per shape bucket. This bench measures each
component on a synthetic Cityscapes-format val set at the real
resolutions:

1. **Protocol wall-clock** — `Evaluator.eval()` end-to-end in the two
   interesting configurations:
   - reference-faithful: batch 1, float32, PNG dumps on (the reference
     evaluates strictly at bs=1, reference:eval.py:24);
   - TPU-native: batch 8, bfloat16, `--no-dump` (the metric-only rate).
   Run twice each: first pass includes bucket compiles, second is the
   steady-state protocol rate (persistent XLA cache makes re-runs of the
   same bucket set compile-free).
2. **Device step rate** — the eval step (forward + argmax + metric
   histogram) in an on-device fori_loop at (8, 1024, 2048) bf16, the
   dispatch-overhead-free device capability (same loop-carry protocol as
   bench.py; the sandbox relay costs ~10 ms/dispatch which the protocol
   numbers above honestly include).
3. **Bucket census** — on a mixed-resolution set (1024×2048 + 768×1536 +
   1000×2000): bucket count == compile count, per-bucket compile time,
   padded-pixel waste.
4. **Host metric-update cost** — SegmentationMetric.update per 1024×2048
   image (the per-sample host work the protocol serializes).

Emits BENCH-style JSON lines; the headline is images/s for the TPU-native
steady-state protocol. Baseline: the reference evaluates Cityscapes val
at bs=1 fp16 on GPU/Atlas — no published eval rate exists, so
vs_baseline is reported against the serving-chip capability instead
(docs/PERFORMANCE.md "Eval").
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time

import numpy as np


def _gen_val_tree(root: str, sizes_counts, seed=0):
    """Cityscapes-format val tree with images at the given (h, w, n)."""
    from fastscnn_tpu.tools.system_check import generate_dataset

    os.makedirs(root, exist_ok=True)
    img_dir = os.path.join(root, "leftImg8bit", "val", "synth")
    lbl_dir = os.path.join(root, "gtFine", "val", "synth")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    idx = 0
    for h, w, n in sizes_counts:
        with tempfile.TemporaryDirectory() as td:
            generate_dataset(td, n_train=0, n_val=n, height=h, width=w, seed=seed + idx)
            src_i = os.path.join(td, "leftImg8bit", "val", "synth")
            src_l = os.path.join(td, "gtFine", "val", "synth")
            for i in range(n):
                shutil.move(
                    os.path.join(src_i, f"synth_{i:06d}_leftImg8bit.png"),
                    os.path.join(img_dir, f"synth_{idx:06d}_leftImg8bit.png"),
                )
                shutil.move(
                    os.path.join(src_l, f"synth_{i:06d}_gtFine_labelIds.png"),
                    os.path.join(lbl_dir, f"synth_{idx:06d}_gtFine_labelIds.png"),
                )
                idx += 1
    return root


def _run_protocol(root, outdir, batch_size, dtype, no_dump, max_images=None,
                  extra_argv=None):
    """One full Evaluator.eval() pass; returns (seconds, n_images)."""
    import contextlib
    import io

    from fastscnn_tpu.eval import Evaluator, parse_args

    argv = [
        "--dataset", "citys", "--data-root", root, "--mode", "testval",
        "--batch-size", str(batch_size), "--dtype", dtype,
        "--outdir", outdir, "--weights", "/nonexistent-use-random-init",
    ]
    if no_dump:
        argv.append("--no-dump")
    argv += extra_argv or []
    if max_images:
        argv += ["--max-images", str(max_images)]
    args = parse_args(argv)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ev = Evaluator(args)
        n = len(ev.dataset) if not max_images else min(len(ev.dataset), max_images)
        t0 = time.perf_counter()
        ev.eval()
        dt = time.perf_counter() - t0
    return dt, n


def _device_loop_rate(batch, h, w, iters=20):
    """Eval step in an on-device fori_loop (loop-carried dependency — see
    bench.py's hoisting-bug note: each iteration must depend on the last)."""
    import jax
    import jax.numpy as jnp

    from fastscnn_tpu.models import FastSCNN, init_fast_scnn
    from fastscnn_tpu.parallel import make_eval_step

    model = FastSCNN(num_classes=19)
    params, state = init_fast_scnn(jax.random.PRNGKey(0), 19)
    step = make_eval_step(model, 19, jit=False)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (batch, h, w, 3), dtype=np.uint8))
    t = jnp.asarray(rng.integers(-1, 19, (batch, h, w)).astype(np.int32))

    def body(i, carry):
        xi, acc = carry
        pred, (correct, labeled, inter, union) = step(params, state, xi, t)
        xi = xi.at[0, 0, 0, 0].add((pred[0, 0, 0] % 2).astype(xi.dtype))
        return (xi, acc + correct)

    @jax.jit
    def bench(xi):
        _, acc = jax.lax.fori_loop(0, iters, body, (xi, jnp.float32(0)))
        return acc

    bench(x).block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    bench(x).block_until_ready()
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--n-uniform", type=int, default=16,
                    help="1024×2048 images in the uniform-set protocol runs")
    ap.add_argument("--skip-mixed", action="store_true")
    ap.add_argument("--skip-device-loop", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--quick", action="store_true",
                    help="tiny shapes on CPU — logic smoke, not a result")
    args = ap.parse_args(argv)
    if args.quick:
        import jax

        jax.config.update("jax_platforms", "cpu")
    H, W = (128, 256) if args.quick else (1024, 2048)

    results = {}
    work = tempfile.mkdtemp(prefix="bench_eval_")
    print(f"# workdir {work}")

    # ---- uniform native-res set (Cityscapes val is all 1024×2048) ----
    uni_root = _gen_val_tree(
        os.path.join(work, "uniform"), [(H, W, args.n_uniform)]
    )
    for label, bs, dtype, no_dump in (
        ("ref_faithful_bs1_f32_dump", 1, "float32", False),
        ("tpu_native_bs8_bf16_nodump", 8, "bfloat16", True),
    ):
        outdir = os.path.join(work, f"out_{label}")
        t_cold, n = _run_protocol(uni_root, outdir, bs, dtype, no_dump)
        t_warm, _ = _run_protocol(uni_root, outdir, bs, dtype, no_dump)
        results[label] = {
            "images": n,
            "cold_s": round(t_cold, 2),
            "steady_s": round(t_warm, 2),
            "images_per_s": round(n / t_warm, 3),
        }
        print(f"{label}: cold {t_cold:.1f}s steady {t_warm:.1f}s "
              f"→ {n / t_warm:.2f} images/s")

    # ---- host metric-update cost ----
    from fastscnn_tpu.utils.metric import SegmentationMetric

    rng = np.random.default_rng(0)
    pred = rng.integers(0, 19, (H, W)).astype(np.int32)
    gt = rng.integers(-1, 19, (H, W)).astype(np.int32)
    metric = SegmentationMetric(19)
    metric.update(pred, gt)  # warm any jit inside
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        metric.update(pred, gt)
    dt = (time.perf_counter() - t0) / reps
    results["metric_update_ms_per_image"] = round(1e3 * dt, 2)
    print(f"metric.update: {1e3 * dt:.1f} ms per {H}×{W} image (host)")

    # ---- device-loop capability ----
    if not args.skip_device_loop:
        rate = _device_loop_rate(8, H, W, iters=3 if args.quick else 20)
        results["device_loop_images_per_s_bs8_bf16"] = round(rate, 2)
        print(f"device fori_loop eval step: {rate:.1f} images/s @ (8,{H},{W}) bf16")

    # ---- mixed-resolution bucket census ----
    if not args.skip_mixed:
        sizes = ([(128, 256, 2), (96, 192, 2), (100, 200, 2)] if args.quick
                 else [(1024, 2048, 4), (768, 1536, 4), (1000, 2000, 4)])
        mix_root = _gen_val_tree(os.path.join(work, "mixed"), sizes, seed=50)
        pad = 64
        waste_num = waste_den = 0
        for h, w, n in sizes:
            ph, pw = -(-h // pad) * pad, -(-w // pad) * pad
            waste_num += n * (ph * pw - h * w)
            waste_den += n * ph * pw
        outdir = os.path.join(work, "out_mixed")
        t_cold, n = _run_protocol(mix_root, outdir, 4, "bfloat16", True)
        t_warm, _ = _run_protocol(mix_root, outdir, 4, "bfloat16", True)
        results["mixed_res"] = {
            "images": n,
            "buckets": len(sizes),  # == compile count: one executable per padded shape
            "cold_s": round(t_cold, 2),
            "steady_s": round(t_warm, 2),
            "compile_s_total": round(t_cold - t_warm, 2),
            "padding_waste_pct": round(100.0 * waste_num / waste_den, 2),
            "images_per_s": round(n / t_warm, 3),
        }
        print(f"mixed-res: {len(sizes)} buckets, cold {t_cold:.1f}s steady "
              f"{t_warm:.1f}s, padding waste {100.0 * waste_num / waste_den:.1f}%")

    # ---- decoded-cache leg (LAST: set_cache_dir is process-global, so
    # every protocol run after this point would be cache-accelerated) ----
    # the protocol is host-decode-bound; --decoded-cache turns the
    # per-image PNG inflate into an npy memcpy. First pass warms the
    # cache, second is the warm-cache steady state.
    cache_dir = os.path.join(work, "decoded_cache")
    outdir = os.path.join(work, "out_cache")
    extra = ["--decoded-cache", cache_dir]
    t_warmup, n = _run_protocol(uni_root, outdir, 8, "bfloat16", True, extra_argv=extra)
    t_cached, _ = _run_protocol(uni_root, outdir, 8, "bfloat16", True, extra_argv=extra)
    results["tpu_native_bs8_bf16_nodump_decoded_cache"] = {
        "images": n,
        "cache_warmup_s": round(t_warmup, 2),
        "steady_s": round(t_cached, 2),
        "images_per_s": round(n / t_cached, 3),
    }
    print(f"decoded-cache leg: warmup {t_warmup:.1f}s warm {t_cached:.1f}s "
          f"→ {n / t_cached:.2f} images/s")

    headline = results.get("tpu_native_bs8_bf16_nodump", {}).get("images_per_s")
    line = {
        "metric": "eval_testval_images_per_s",
        "value": headline,
        "unit": "images/s (bs8 bf16 metric-only steady-state protocol, 1024×2048)",
        "detail": results,
    }
    print(json.dumps(line))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(line, f, indent=1)
    shutil.rmtree(work, ignore_errors=True)
    return line


if __name__ == "__main__":
    main()
