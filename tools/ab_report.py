#!/usr/bin/env python
"""Summarize tools/ab_stem.sh output into per-impl medians.

The A/B log interleaves `--- rep R <knob>=<impl>` markers with one JSON
line per bench invocation ({"metric", "value", "unit", ...}); cross-run
numbers drift with pool load, so the summary reports per-impl median and
spread plus the interleaved deltas vs the baseline impl within each rep
(the only comparison the measurement protocol trusts —
docs/PERFORMANCE.md "Measurement methodology").

    python tools/ab_report.py /tmp/ab_stem_results.log
"""

from __future__ import annotations

import json
import re
import statistics
import sys
from collections import defaultdict

BASELINES = {"fps/chip": "conv", "samples/sec/chip": "xla", "samples/s": "xla"}


def parse(path: str):
    runs = []  # (section, rep, impl, unit, value)
    rep, impl = None, None
    for line in open(path):
        m = re.match(r"--- rep (\d+) (?:dw_impl|stem_impl)=(\S+)", line.strip())
        if m:
            rep, impl = int(m.group(1)), m.group(2)
            continue
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if impl is not None:
                runs.append((d.get("unit", "?"), rep, impl, float(d["value"])))
    return runs


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_stem_results.log"
    runs = parse(path)
    if not runs:
        print(f"no bench JSON lines found in {path}")
        return
    by_unit: dict = defaultdict(lambda: defaultdict(list))
    by_rep: dict = defaultdict(dict)
    for unit, rep, impl, val in runs:
        by_unit[unit][impl].append(val)
        by_rep[(unit, rep)][impl] = val
    for unit, impls in by_unit.items():
        base = BASELINES.get(unit)
        print(f"\n== {unit} ==")
        base_med = statistics.median(impls[base]) if base in impls else None
        for impl, vals in sorted(impls.items(), key=lambda kv: -statistics.median(kv[1])):
            med = statistics.median(vals)
            spread = (max(vals) - min(vals)) / med * 100 if med else 0.0
            rel = f"  {med / base_med - 1:+7.1%} vs {base}" if base_med and impl != base else ""
            print(f"  {impl:12s} median {med:9.1f}  (n={len(vals)}, spread {spread:4.1f}%){rel}")
        # interleaved per-rep deltas (the trustworthy comparison)
        if base_med:
            for (u, rep), vals in sorted(by_rep.items()):
                if u != unit or base not in vals:
                    continue
                deltas = ", ".join(
                    f"{impl} {vals[impl] / vals[base] - 1:+.1%}"
                    for impl in sorted(vals)
                    if impl != base
                )
                print(f"  rep {rep} vs {base}: {deltas}")


if __name__ == "__main__":
    main()
