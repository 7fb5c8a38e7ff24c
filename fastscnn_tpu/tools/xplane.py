"""Per-op attribution of a ``jax.profiler`` device trace (XPlane).

The TPU-native analogue of the reference's wall-clock stage timers
(reference:train.py prints per-stage seconds): every round-2 serving and
training optimization decision in docs/PERFORMANCE.md was driven by this
table — op self-time, occurrences, and HBM ``bytes_accessed`` (so each
row carries its own achieved-GB/s roofline check).

Usage::

    python -m fastscnn_tpu.tools.xplane TRACE_DIR [--top N] [--iters K]

``TRACE_DIR`` is the directory passed to
``fastscnn_tpu.utils.profiling.device_trace`` (it finds the newest
``*.xplane.pb`` underneath). ``--iters`` divides times by the number of
bench iterations inside the traced block so rows read as per-iteration.
"""

from __future__ import annotations

import argparse
import glob
import os
from collections import defaultdict


def _load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace, paths[-1]


def device_op_table(trace_dir: str):
    """Aggregate device-plane events → list of dicts sorted by self time.

    Only planes named like '/device:TPU:*' (XLA ops line) are counted;
    host threads are skipped. Returns (rows, total_device_seconds).
    """
    xspace, path = _load_xspace(trace_dir)
    rows: dict[str, dict] = defaultdict(
        lambda: {"time_ps": 0, "count": 0, "bytes": 0, "flops": 0}
    )
    total_ps = 0
    for plane in xspace.planes:
        if "TPU" not in plane.name and "device:" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        for line in plane.lines:
            # Only the leaf op line: 'XLA Modules' is the whole program,
            # 'Async XLA Ops' are overlapped prefetches (copy-start of
            # weights under the compute) — counting either double-books.
            if line.name != "XLA Ops":
                continue
            for event in line.events:
                md = ev_meta.get(event.metadata_id)
                name = md.name if md else f"id{event.metadata_id}"
                # skip obvious non-op infrastructure rows
                if name.startswith(("RunGraph", "Infeed", "Outfeed")):
                    continue
                # the outer while/comparison scaffolding of the bench loop
                if name.startswith("%while") or " = (s32[]" in name[:40]:
                    continue
                r = rows[name]
                r["time_ps"] += event.duration_ps
                r["count"] += 1
                # cost stats appear on the event in older profiler
                # versions and on the event *metadata* (per-symbol,
                # constant per execution) in newer ones. Per stat key,
                # prefer the event-level value and fall back to the
                # metadata value only when the key is absent from
                # event.stats — a version emitting both would otherwise
                # double every op's bytes/flops (and the roofline).
                ev_keys = set()
                for stat in event.stats:
                    sm = stat_meta.get(stat.metadata_id)
                    key = sm.name if sm else ""
                    ev_keys.add(key)
                    if key == "bytes_accessed":
                        r["bytes"] += stat.int64_value or stat.uint64_value
                    elif key == "flops":
                        r["flops"] += stat.int64_value or stat.uint64_value
                for stat in (list(md.stats) if md is not None else []):
                    sm = stat_meta.get(stat.metadata_id)
                    key = sm.name if sm else ""
                    if key in ev_keys:
                        continue
                    if key == "bytes_accessed":
                        r["bytes"] += stat.int64_value or stat.uint64_value
                    elif key == "flops":
                        r["flops"] += stat.int64_value or stat.uint64_value
                total_ps += event.duration_ps
    out = [dict(name=k, **v) for k, v in rows.items()]
    out.sort(key=lambda r: -r["time_ps"])
    return out, total_ps / 1e12, path


# v5e single-chip peaks (same constants as bench.py's MFU line)
HBM_GBPS = 819.0
MXU_TFLOPS_BF16 = 197.0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--iters", type=int, default=1,
                    help="bench iterations inside the traced block")
    ap.add_argument("--roofline", action="store_true",
                    help="add per-op FLOPs, HBM/MXU floor times, the "
                    "binding roofline, and %%-of-floor columns (v5e "
                    "peaks: 197 TFLOP/s bf16, 819 GB/s HBM). NB a "
                    "VMEM-resident fusion can legitimately sit far above "
                    "both floors — the floors bound, they don't explain.")
    args = ap.parse_args(argv)
    rows, total_s, path = device_op_table(args.trace_dir)
    k = args.iters
    print(f"# {path}")
    print(f"# device total: {1e3 * total_s / k:.2f} ms/iter over {len(rows)} ops")
    if not args.roofline:
        print(f"{'ms/iter':>9} {'%':>5} {'count':>6} {'GB/s':>7}  name")
        for r in rows[: args.top]:
            ms = 1e3 * r["time_ps"] / 1e12 / k
            pct = 100.0 * r["time_ps"] / (total_s * 1e12) if total_s else 0.0
            gbs = (r["bytes"] / (r["time_ps"] / 1e12) / 1e9) if r["time_ps"] else 0.0
            print(f"{ms:9.3f} {pct:5.1f} {r['count']:6d} {gbs:7.0f}  {r['name'][:110]}")
        return
    print(f"{'ms/iter':>9} {'%':>5} {'GB/s':>7} {'GFLOP':>8} "
          f"{'hbm_ms':>8} {'mxu_ms':>8} {'bound':>5} {'xfloor':>7}  name")
    floor_total_ms = 0.0
    for r in rows:
        ms = 1e3 * r["time_ps"] / 1e12 / k
        hbm_ms = 1e3 * (r["bytes"] / k) / (HBM_GBPS * 1e9)
        mxu_ms = 1e3 * (r["flops"] / k) / (MXU_TFLOPS_BF16 * 1e12)
        floor_total_ms += max(hbm_ms, mxu_ms)
    for r in rows[: args.top]:
        ms = 1e3 * r["time_ps"] / 1e12 / k
        pct = 100.0 * r["time_ps"] / (total_s * 1e12) if total_s else 0.0
        gbs = (r["bytes"] / (r["time_ps"] / 1e12) / 1e9) if r["time_ps"] else 0.0
        gflop = r["flops"] / k / 1e9
        hbm_ms = 1e3 * (r["bytes"] / k) / (HBM_GBPS * 1e9)
        mxu_ms = 1e3 * (r["flops"] / k) / (MXU_TFLOPS_BF16 * 1e12)
        bound = "mxu" if mxu_ms > hbm_ms else "hbm"
        floor = max(hbm_ms, mxu_ms)
        xfloor = ms / floor if floor > 0 else float("inf")
        print(f"{ms:9.3f} {pct:5.1f} {gbs:7.0f} {gflop:8.2f} "
              f"{hbm_ms:8.3f} {mxu_ms:8.3f} {bound:>5} "
              f"{xfloor:7.1f}x  {r['name'][:90]}")
    total_ms = 1e3 * total_s / k
    if total_ms > 0 and floor_total_ms > 0:
        print(f"# composable bound: sum of per-op max(hbm,mxu) floors = "
              f"{floor_total_ms:.2f} ms/iter → floor is "
              f"{100.0 * floor_total_ms / total_ms:.0f}% of measured "
              f"({total_ms:.2f} ms); ops above both floors are VMEM/VPU/"
              f"schedule-bound, not mismeasured")
    else:
        print("# no device ops with cost stats in this trace "
              "(CPU traces carry no TPU op plane)")


if __name__ == "__main__":
    main()
