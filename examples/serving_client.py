#!/usr/bin/env python3
"""Minimal client for the batching inference server (fastscnn_tpu.serving).

Start the server (any dataset/weights; random init works for a demo):

    python -m fastscnn_tpu.serving --dataset custom --height 128 --width 128 \
        --max-batch 8 --port 8500

then run this client to POST frames and print mask stats + latency:

    python examples/serving_client.py --url http://127.0.0.1:8500 \
        --image path/to/frame.jpg --repeat 32 --concurrency 8
"""

import argparse
import io
import json
import threading
import time
import urllib.request

import numpy as np
from PIL import Image


def encode_image(path: str | None) -> bytes:
    if path:
        img = Image.open(path).convert("RGB")
    else:
        rng = np.random.default_rng(0)
        img = Image.fromarray(rng.integers(0, 255, (128, 128, 3), dtype=np.uint8).astype(np.uint8))
    bio = io.BytesIO()
    img.save(bio, "JPEG", quality=92)
    return bio.getvalue()


def main():
    parser = argparse.ArgumentParser(description="serving client example")
    parser.add_argument("--url", default="http://127.0.0.1:8500")
    parser.add_argument("--image", default=None, help="frame to send (random if unset)")
    parser.add_argument("--repeat", type=int, default=16)
    parser.add_argument("--concurrency", type=int, default=4)
    args = parser.parse_args()

    body = encode_image(args.image)
    latencies: list[float] = []
    errors: list[str] = []
    lock = threading.Lock()

    def one():
        req = urllib.request.Request(
            args.url + "/predict",
            data=body,
            headers={"Accept": "application/json"},
            method="POST",
        )
        t0 = time.perf_counter()
        try:
            payload = json.loads(urllib.request.urlopen(req, timeout=120).read())
        except Exception as e:
            with lock:
                errors.append(f"{type(e).__name__}: {e}")
            return None
        dt = time.perf_counter() - t0
        mask = np.asarray(payload["mask"])
        with lock:
            latencies.append(dt)
        return mask

    # warm-up (first request pays XLA compilation unless cached)
    mask = one()
    if mask is None:
        raise SystemExit(f"warm-up request failed: {errors[-1]}")
    print(f"mask shape {mask.shape}, classes {sorted(np.unique(mask).tolist())}")
    latencies.clear()

    t0 = time.perf_counter()
    threads = []
    for i in range(args.repeat):
        t = threading.Thread(target=one)
        t.start()
        threads.append(t)
        if (i + 1) % args.concurrency == 0:
            for t in threads:
                t.join()
            threads = []
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    lat = sorted(latencies)
    if errors:
        print(f"{len(errors)} of {args.repeat} requests failed; first: {errors[0]}")
    if not lat:
        raise SystemExit("no successful requests — no latency stats")
    print(f"{len(lat)} requests in {wall:.2f}s ({len(lat) / wall:.1f} rps)")
    print(f"latency p50 {lat[len(lat) // 2] * 1e3:.1f} ms, p95 {lat[int(0.95 * (len(lat) - 1))] * 1e3:.1f} ms")
    stats = json.loads(urllib.request.urlopen(args.url + "/stats", timeout=10).read())
    print("server stats:", json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
