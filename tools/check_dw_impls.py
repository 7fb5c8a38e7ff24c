#!/usr/bin/env python
"""Device-side mask parity across folded_dw_impl variants (bf16, real TPU).

The CPU tests pin f32 fallback equality; this checks the actual TPU bf16
kernels against the default conv graph at a realistic shape before any
default flip (ties at bf16 CAN legitimately flip single pixels — report,
don't assert). Run on a live chip:

    python tools/check_dw_impls.py [--height 512 --width 1024 --batch 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--classes", type=int, default=19)
    args = ap.parse_args()

    import jax

    from fastscnn_tpu.engine import E2EConfig, InferenceEngine
    from fastscnn_tpu.models import FastSCNN, init_fast_scnn

    params, state = init_fast_scnn(jax.random.PRNGKey(0), args.classes)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (args.batch, args.height, args.width, 3), dtype=np.uint8)

    masks = {}
    for impl in ("conv", "taps", "pallas", "fused-ds", "fused-ds-mr"):
        model = FastSCNN(num_classes=args.classes, folded_dw_impl=impl)
        eng = InferenceEngine(
            model, params, state, config=E2EConfig(compute_dtype="bfloat16")
        )
        masks[impl] = np.asarray(eng.predict(x))
        if impl != "conv":
            diff = float((masks[impl] != masks["conv"]).mean())
            status = "OK" if diff < 5e-3 else "SUSPECT"
            print(f"{impl:12s} vs conv: pixel diff {diff:.3e}  [{status}]")
    print("done")


if __name__ == "__main__":
    main()
