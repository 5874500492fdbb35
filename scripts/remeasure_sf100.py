#!/usr/bin/env python3
"""Quiet 5x-warm fresh-JVM re-measure of the r12 sf100 outliers
(VERDICT r12 items 1 and 6).

The r12 decade pass flagged q_range_join (28.5 -> 127.8 s, 4.5x) and
q_kmeans (3.1 -> 11.7 s, 3.7x) as `weak`, plus six queries in a
2.0-2.5x watch band. All eight sat inside the pass's stale-shuffle
plateau window (~22 GB of dead shuffle files held), so before any code
change the BASELINE.md recipe applies: measure each query 5x in ONE
fresh JVM on a quiet box (no concurrent Spark/CPU work, single-digit-ms
fsync), and only believe a regression that survives warm steady state.

Output: SF100_REMEASURE_r13.json with, per query, all five walls, the
cold wall, warm min/median, and ratios against BOTH the r12 single-pass
number and the r9 best-of-union ledger. A query leaves the weak list
when warm_median / r9_union <= 1.5 (the bar VERDICT r12 set); otherwise
the delta is real and gets a plan diff next.

Usage: python scripts/remeasure_sf100.py [--reps 5] [--only a,b]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The two weak-flagged outliers first, then the 2.0-2.5x watch band in
# VERDICT order.
TARGETS = [
    "q_range_join",
    "q_kmeans",
    "q_survival_km",
    "q_cdc_apply",
    "q_gdpr_erasure",
    "q_cohort_retention",
    "q_join_fk_agg",
    "q_grouped_agg_udf",
]


def _r9_union() -> dict:
    base = None
    with open(os.path.join(REPO, "BENCH_HISTORY.jsonl")) as f:
        for line in f:
            d = json.loads(line)
            if d.get("sf") == 100.0 and d.get("combined_from_runs"):
                base = d
    return (base or {}).get("queries", {})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--only", default="")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", os.path.join(REPO, ".localdata", "sf100")
        ),
    )
    ap.add_argument(
        "--out", default=os.path.join(REPO, "SF100_REMEASURE_r13.json")
    )
    args = ap.parse_args()
    targets = [t for t in args.only.split(",") if t] or TARGETS

    import bench  # LARGE_RESULT drain policy — keep walls comparable
    from block_data_fetcher_spark import api
    from block_data_fetcher_spark.session import get_spark

    spark = get_spark("bdf-sf100-remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = api.queries()
    r12 = json.load(open(os.path.join(REPO, "BENCH_SF100_r12.json")))[
        "queries"
    ]
    r9 = _r9_union()

    # Merge-resume: a crashed run (e.g. the first attempt OOMed on
    # query 7 of 8 after 30 heavy sf100 reps) keeps its completed
    # entries; re-invoke with --only for the remainder.
    results: dict[str, dict] = {}
    if os.path.exists(args.out):
        results = json.load(open(args.out)).get("queries", {})
    for name in targets:
        fn = queries[name]
        walls: list[float] = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            if name in bench.LARGE_RESULT:
                df.count()
            else:
                df.collect()
            walls.append(round(time.perf_counter() - t0, 3))
            df = None  # release the plan (same rule as bench.py)
            # Between-rep hygiene (the first attempt died acquiring
            # execution memory on rep 31 of the session): drop the
            # previous rep's AQE stages/broadcasts before the next one
            # allocates its sorters.
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        warm = sorted(walls[1:]) or walls
        entry = {
            "walls": walls,
            "cold": walls[0],
            "warm_min": warm[0],
            "warm_median": warm[len(warm) // 2],
            "r12_pass": r12.get(name),
            "r9_union": r9.get(name),
        }
        if entry["r9_union"]:
            entry["warm_vs_r9"] = round(
                entry["warm_median"] / entry["r9_union"], 2
            )
            entry["cleared"] = entry["warm_vs_r9"] <= 1.5
        results[name] = entry
        sys.stderr.write(f"{name}: {entry}\n")
        # Incremental artifact: write after EVERY query so a mid-run
        # crash never loses completed measurements.
        out = {
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "sf": 100.0,
            "reps": args.reps,
            "note": (
                "fresh-JVM quiet-box 5x-warm re-measure per BASELINE.md;"
                " warm_median vs r9 best-of-union decides the weak flags"
            ),
            "queries": results,
        }
        with open(args.out + ".tmp", "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        os.replace(args.out + ".tmp", args.out)
    print(json.dumps({k: v.get("warm_vs_r9") for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
