#!/usr/bin/env python3
"""r16 optimization-round measurement harness (guide §1).

For each named query: build the plan, dump `.explain("formatted")` to
plans/r16/<q>_<tag>.txt, then execute it exactly the way bench.py does
(count() for LARGE_RESULT, collect() otherwise) `--reps` times in ONE
warm session. First wall is the cold number (codegen + planning), the
rest are warm steady state — the same 5x-warm discipline as
scripts/remeasure_sf100.py, at bench scale.

Usage:
  python scripts/profile_r16.py --only q_a,q_b [--reps 3] [--tag before]
  python scripts/profile_r16.py --top 30 --reps 2 --tag before
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import LARGE_RESULT  # noqa: E402
from block_data_fetcher_spark import api  # noqa: E402
from block_data_fetcher_spark.session import get_spark  # noqa: E402


def _top_from_history(n: int) -> list[str]:
    last = None
    with open(os.path.join(REPO, "BENCH_HISTORY.jsonl")) as f:
        for line in f:
            d = json.loads(line)
            if d.get("sf") == 0.1 and not d.get("subset"):
                last = d
    qs = {k: v for k, v in (last or {})["queries"].items() if v >= 0}
    return [k for k, _ in sorted(qs.items(), key=lambda kv: -kv[1])[:n]]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    targets = [q for q in args.only.split(",") if q]
    if args.top:
        targets += [q for q in _top_from_history(args.top) if q not in targets]
    if not targets:
        ap.error("need --only or --top")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("bdf-profile-r16")
    spark.sparkContext.setLogLevel("ERROR")
    queries = api.queries()
    unknown = [q for q in targets if q not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # bench.py-equivalent warm-up so the first target doesn't absorb
    # session init (JVM, parquet footers, Python worker pool).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("lineitem", "events", "documents", "embeddings"):
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).collect()
        except Exception:
            pass

    results: dict[str, dict] = {}
    for name in targets:
        fn = queries[name]
        walls: list[float] = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                if name in LARGE_RESULT:
                    df.count()
                else:
                    df.collect()
            except Exception as e:
                sys.stderr.write(f"{name} FAILED: {e}\n")
                walls.append(-1.0)
                break
            walls.append(round(time.perf_counter() - t0, 3))
            if rep == 0 and not args.no_plans:
                try:
                    buf = io.StringIO()
                    with contextlib.redirect_stdout(buf):
                        df.explain("formatted")
                    with open(
                        os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w"
                    ) as f:
                        f.write(buf.getvalue())
                except Exception as e:
                    sys.stderr.write(f"{name} explain failed: {e}\n")
            df = None
        ok = [w for w in walls if w >= 0]
        results[name] = {
            "walls": walls,
            "cold": walls[0] if walls else None,
            "warm_median": (
                round(statistics.median(ok[1:]), 3) if len(ok) > 1 else None
            ),
        }
        sys.stderr.write(f"{name}: {walls}\n")
        sys.stderr.flush()

    out = {
        "tag": args.tag,
        "sf_dir": sf_dir,
        "reps": args.reps,
        "results": results,
    }
    print(json.dumps(out, indent=1, sort_keys=True))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
