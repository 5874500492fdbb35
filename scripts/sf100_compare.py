"""Live/terminal comparison of an sf100 single pass against the
canonical current-box ledger (SF100_LEDGER.json — r14 re-base, built
by scripts/build_sf100_ledger.py; VERDICT r13 item 5 retired the r9
best-of-seven union after the r9-checkout A/B proved its residual
deltas were box drift, not code).

Reads the in-flight (or final) BENCH_DETAIL.json next to the repo root
and the ledger, then prints per-query ratios for everything completed
so far — so a regression surfaces while the pass is still running,
not 4 h later.

Usage: python scripts/sf100_compare.py [--floor 5] [--top 20]
       [--baseline r9]   # the retired union, for archaeology only
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--floor", type=float, default=5.0,
                    help="ignore queries under this many sec in BOTH runs")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--detail", default=os.path.join(REPO, "BENCH_DETAIL.json"))
    ap.add_argument("--baseline", default="ledger", choices=["ledger", "r9"])
    args = ap.parse_args()

    base = None
    baseline_used = args.baseline
    if args.baseline == "ledger":
        # ADVICE r14: never silently substitute the retired r9 union
        # for a missing ledger while still labelling the output
        # "ledger" — that is exactly the false-weak-flag source the
        # re-base retired. Missing ledger is an error; run
        # scripts/build_sf100_ledger.py first.
        path = os.path.join(REPO, "SF100_LEDGER.json")
        if not os.path.exists(path):
            print(json.dumps({
                "ok": False,
                "reason": "SF100_LEDGER.json missing; build it with "
                "scripts/build_sf100_ledger.py (or pass --baseline r9 "
                "explicitly)",
            }))
            return 1
        base = json.load(open(path))
    else:  # --baseline r9, requested explicitly
        with open(os.path.join(REPO, "BENCH_HISTORY.jsonl")) as f:
            for line in f:
                d = json.loads(line)
                if d.get("sf") == 100.0 and d.get("combined_from_runs"):
                    base = d
        baseline_used = "r9_union"
    if base is None:
        print(json.dumps({"ok": False, "reason": "no sf100 baseline"}))
        return 1

    det = json.load(open(args.detail))
    cur = det.get("queries", det)
    bq = base["queries"]
    shared = [
        k for k in cur
        if k in bq and cur[k] > 0 and bq[k] > 0
        and max(cur[k], bq[k]) >= args.floor
    ]
    ranked = sorted(((round(cur[k] / bq[k], 2), k, cur[k], bq[k])
                     for k in shared), reverse=True)
    import statistics
    out = {
        "n_done": len(cur),
        "n_compared": len(shared),
        # Both headline sums cover the SAME query set (successes only,
        # present in both runs) so a failed query can't deflate one
        # side; the baseline seconds of any failures show separately.
        "sum_cur_sec": round(
            sum(cur[k] for k in cur if cur[k] > 0 and k in bq), 1
        ),
        "sum_base_same_queries": round(
            sum(bq[k] for k in cur if cur[k] > 0 and k in bq), 1
        ),
        "failed_base_sec": round(
            sum(bq[k] for k in cur if cur[k] < 0 and k in bq), 1
        ),
        "ratio_median": (round(statistics.median(r[0] for r in ranked), 3)
                          if ranked else None),
        "baseline": baseline_used,
        "top_ratios": [
            {"q": k, "ratio": r, "cur_s": c, "base_s": b}
            for r, k, c, b in ranked[: args.top]
        ],
        "failed": sorted(k for k, v in cur.items() if v < 0),
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
