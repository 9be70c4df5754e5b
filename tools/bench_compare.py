#!/usr/bin/env python
"""Diff two bench.py JSON outputs per query.

    python tools/bench_compare.py BENCH_r02.json /tmp/bench_now.json

Accepts either the raw one-line JSON bench.py prints or the driver's
wrapper ({"parsed": {...}}). Flags regressions beyond --threshold
(default 25 %) on the steady-state numbers, and prints the common-set
totals — totals across DIFFERENT query sets are meaningless, so only
the intersection is summed. Exit 1 when a regression exceeds the
threshold (measure on an idle machine first: local[32] numbers swing
30-50 % under load; re-run the flagged query in isolation before
believing it).
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    if "parsed" in d:
        d = d["parsed"]
    return d["queries"]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("before")
    ap.add_argument("after")
    ap.add_argument("--threshold", type=float, default=0.25)
    args = ap.parse_args()

    a, b = _load(args.before), _load(args.after)
    common = sorted(set(a) & set(b))
    regressions = []
    for n in common:
        if a[n] <= 0:
            print(f"{n}: {a[n]:.3f} -> {b[n]:.3f}  (before is zero; skipped)")
            continue
        delta = b[n] / a[n] - 1
        mark = ""
        if delta > args.threshold:
            mark = "  <-- REGRESSION"
            regressions.append(n)
        elif delta < -args.threshold:
            mark = "  (improved)"
        print(f"{n}: {a[n]:.3f} -> {b[n]:.3f}  {delta:+.0%}{mark}")
    for n in sorted(set(b) - set(a)):
        print(f"{n}: NEW {b[n]:.3f}")
    for n in sorted(set(a) - set(b)):
        print(f"{n}: REMOVED (was {a[n]:.3f})")
    ta, tb = sum(a[n] for n in common), sum(b[n] for n in common)
    if ta > 0:
        print(f"common-set total: {ta:.2f} -> {tb:.2f}  ({tb / ta - 1:+.0%})")
    else:
        print("no common queries — totals not comparable")
    if regressions:
        print(f"regressed beyond {args.threshold:.0%}: {regressions}")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
