#!/usr/bin/env python
"""Decade-ratio report between two BENCH_HISTORY.jsonl runs.

Usage: python scripts/scale_ratio.py [--num-sf 100] [--den-sf 10]
       [--top 40] [--min-den 1.0]

Picks the LATEST full (non-subset) run at each scale factor and prints
per-query num/den ratios sorted descending — the triage list for
worse-than-linear scaling (fixture rows grow 10x per decade, so a
healthy ratio is ~10 for scan-bound queries, below ~10 for
startup-dominated ones, and anything well above warrants a plan read).
"""

from __future__ import annotations

import argparse
import json
import os

HIST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "BENCH_HISTORY.jsonl")


def latest_full(sf: float) -> dict:
    best = None
    with open(HIST) as f:
        for line in f:
            r = json.loads(line)
            if r.get("sf") == sf and not r.get("subset"):
                best = r
    if best is None:
        raise SystemExit(f"no full run at sf={sf} in BENCH_HISTORY.jsonl")
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-sf", type=float, default=100.0)
    ap.add_argument("--den-sf", type=float, default=10.0)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--min-den", type=float, default=1.0,
                    help="skip queries faster than this at the denominator "
                         "scale (ratio of two sub-second timings is noise)")
    args = ap.parse_args()

    num, den = latest_full(args.num_sf), latest_full(args.den_sf)
    nq, dq = num["queries"], den["queries"]
    print(f"num: ts={num['ts']} sf={num['sf']} wall={num['value']}s "
          f"n_failed={num['n_failed']}")
    print(f"den: ts={den['ts']} sf={den['sf']} wall={den['value']}s "
          f"n_failed={den['n_failed']}")
    both = sorted(set(nq) & set(dq))
    missing = sorted(set(dq) - set(nq)) + sorted(set(nq) - set(dq))
    if missing:
        print(f"asymmetric coverage ({len(missing)}): {missing[:10]} ...")
    rows = []
    for q in both:
        a, b = nq[q], dq[q]
        if a < 0 or b < 0:
            rows.append((float("inf"), q, a, b))
        elif b >= args.min_den:
            rows.append((a / b, q, a, b))
    rows.sort(reverse=True)
    print(f"{'ratio':>8}  {'num_s':>9}  {'den_s':>8}  query")
    for ratio, q, a, b in rows[: args.top]:
        print(f"{ratio:8.1f}  {a:9.1f}  {b:8.1f}  {q}")


if __name__ == "__main__":
    main()
