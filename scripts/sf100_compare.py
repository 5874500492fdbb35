"""Live/terminal comparison of an sf100 single pass against the r9
union ledger (the on-file decade numbers, ``combined_from_runs: 7``).

Reads the in-flight (or final) BENCH_DETAIL.json next to the repo root
and the most recent combined sf100 line from BENCH_HISTORY.jsonl, then
prints per-query ratios for everything completed so far — so a
regression surfaces while the pass is still running, not 4 h later.

Usage: python scripts/sf100_compare.py [--floor 5] [--top 20]
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
    args = ap.parse_args()

    base = None
    with open(os.path.join(REPO, "BENCH_HISTORY.jsonl")) as f:
        for line in f:
            d = json.loads(line)
            if d.get("sf") == 100.0 and d.get("combined_from_runs"):
                base = d
    if base is None:
        print(json.dumps({"ok": False, "reason": "no combined sf100 baseline"}))
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
        "top_ratios": [
            {"q": k, "ratio": r, "cur_s": c, "r9_s": b}
            for r, k, c, b in ranked[: args.top]
        ],
        "failed": sorted(k for k, v in cur.items() if v < 0),
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
