"""Per-op A/B of the fused int8 pointwise-conv Pallas kernels vs the
bf16 status quo, at the serving graph's actual pw-conv shapes.

Decision context (docs/PERFORMANCE.md): the serving graph's pointwise
convs run at 600-700 GB/s — near HBM bandwidth in bf16 — so the only
lever is moving fewer bytes. XLA int8 was measured and rejected (s8 conv
at bf16 speed, requant doesn't fuse); the PTQ accuracy study
(docs/quant_study_r3.json) shows w8a8 costs ≤0.005 mIoU, which unblocked
building ops/pallas/int8_pw.py. This tool decides whether the kernel
actually wins on hardware.

Shapes: every pointwise conv of the flagship serving graph at
1024×2048 (fastscnn_tpu/models/fast_scnn.py channel plan — LTD(32,48,64),
GFE(64,[64,96,128],t=6), FFM(128), Classifier(128)), expressed as the
(M, K, N) matmul each one is, at a configurable batch.

Timing: the house on-device fori_loop protocol (InferenceEngine.
throughput_fn's iteration-dependence trick — the output perturbs the
input so XLA cannot hoist the op out of the loop). The producer-side
quantize_act is NOT counted: in deployment it fuses into the producing
op's epilogue (and int8-out chains feed int8-in directly); the bf16
baseline likewise gets its input for free from the previous op.

Usage::

    python tools/ab_int8_pw.py [--batch 16] [--iters 30] [--repeat 3]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# (name, h, w, k, n): spatial at 1024×2048 input; M = batch·h·w
SITES = [
    ("ds1-pw", 256, 512, 32, 48),
    ("ds2-pw", 128, 256, 48, 64),
    ("b1.1-expand", 128, 256, 64, 384),
    ("b1.1-project", 64, 128, 384, 64),
    ("b1.2-expand", 64, 128, 64, 384),
    ("b2.2-expand", 32, 64, 96, 576),
    ("ffm-high", 128, 256, 64, 128),
    ("ffm-low-pw", 128, 256, 128, 128),
    ("cls-ds-pw", 128, 256, 128, 128),
]


def _time_loop(build_fn, x0, iters, repeat):
    """build_fn(x) -> (out_for_perturb, op output ignored); returns best
    seconds/iter over `repeat` timed runs of an on-device iters-loop."""
    from jax import lax

    def body(i, carry):
        x, acc = carry
        out = build_fn(x)
        # iteration dependence: one element of the output perturbs one
        # element of the input (int8-safe arithmetic)
        delta = (out[0, 0].astype(jnp.int32) % 2).astype(x.dtype)
        x = x.at[0, 0].add(delta)
        return (x, acc + out[0, 0].astype(jnp.float32))

    @jax.jit
    def bench(x):
        _, acc = lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
        return acc

    bench(x0).block_until_ready()  # compile + warm
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        bench(x0).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _auto_block_m(k, n):
    """The kernels' own auto tiling (so the A/B measures what deployment
    runs)."""
    from fastscnn_tpu.ops.pallas.int8_pw import _auto_block_m as auto

    return auto(k, n)


def run_site(name, m, k, n, iters, repeat, rng, block_m=None):
    from fastscnn_tpu.ops.pallas.int8_pw import pw_conv_a8, pw_conv_w8a8

    bm = block_m or _auto_block_m(k, n)
    w = rng.normal(0, 0.05, (k, n)).astype(np.float32)
    b = rng.normal(0, 0.1, (n,)).astype(np.float32)
    x_bf = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
    x_q = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    w_bf = jnp.asarray(w, jnp.bfloat16)
    w_q = jnp.asarray(np.clip(np.round(w / (np.abs(w).max(0) / 127.0)), -127, 127), jnp.int8)
    cs = jnp.asarray(np.abs(w).max(0) / 127.0 * 0.01, jnp.float32)
    bj = jnp.asarray(b)

    def bf16_ref(x):
        t = jnp.dot(x, w_bf, preferred_element_type=jnp.float32) + bj
        return jnp.maximum(t, 0.0).astype(jnp.bfloat16)

    variants = {
        "bf16-xla": (bf16_ref, x_bf, 2, 2),
        "a8-bf16out": (
            lambda x: pw_conv_a8(x, w_bf, bj, use_pallas=True, block_m=bm), x_q, 1, 2),
        "a8-i8out": (
            lambda x: pw_conv_a8(
                x, w_bf, bj, quantize_out=True, use_pallas=True, block_m=bm),
            x_q, 1, 1),
        "w8a8-i8out": (
            lambda x: pw_conv_w8a8(
                x, w_q, cs, bj, quantize_out=True, use_pallas=True, block_m=bm),
            x_q, 1, 1),
    }
    rows = {}
    base = None
    for vname, (fn, x0, in_b, out_b) in variants.items():
        sec = _time_loop(fn, x0, iters, repeat)
        gbs = (m * k * in_b + m * n * out_b) / sec / 1e9
        rows[vname] = {"us": sec * 1e6, "GB/s": gbs}
        if vname == "bf16-xla":
            base = sec
        print(
            f"  {name:14s} {vname:11s} {sec*1e6:9.1f} us  {gbs:7.1f} GB/s"
            f"  {'' if base is None else f'x{base/sec:.2f}'}",
            flush=True,
        )
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--repeat", type=int, default=3)
    p.add_argument("--block-m", type=int, default=None, help="override the auto tile")
    p.add_argument("--sites", default=None, help="comma-separated site-name filter")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}, batch {args.batch}", flush=True)
    results = {}
    keep = set(args.sites.split(",")) if args.sites else None
    for name, h, w, k, n in SITES:
        if keep and name not in keep:
            continue
        m = args.batch * h * w
        results[name] = {
            "m": m, "k": k, "n": n,
            "rows": run_site(name, m, k, n, args.iters, args.repeat, rng, args.block_m),
        }
    out = {"batch": args.batch, "iters": args.iters, "sites": results}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
