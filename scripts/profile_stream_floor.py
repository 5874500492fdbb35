#!/usr/bin/env python3
"""Where does the ~1 s/query streaming lifecycle floor go? (VERDICT r15
item 4, guide §1.1.)

For each stream query: wall = build+start + trigger executions + stop +
sink readback. This harness wraps jobs._await_bounded to capture each
StreamingQuery's progress `durationMs` breakdown (triggerExecution =
addBatch + getBatch/latestOffset + queryPlanning + walCommit +
commitOffsets) and times the remaining segments from outside:

  build_start_s  = fn() entry -> _await_bounded entry (plan build,
                   checkpoint dir create, query START: the analysis +
                   first IncrementalExecution setup)
  await_s        = _await_bounded wall (trigger executions + the
                   stream's own stop/finalize)
  readback_s     = collect()/count() of the returned sink table
  trigger_ms     = sum of progress triggerExecution (engine-attributed)

Everything inside await_s that is not trigger_ms, plus build_start_s,
is Spark stream-lifecycle machinery (StreamExecution thread spin-up,
offset-log/commit-log WAL, microbatch planning walls); readback_s is
the harness's own measurement of the sink scan.

Usage: python scripts/profile_stream_floor.py [--reps 3] [--only a,b]
Writes plans/r16/stream_floor_profile.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from block_data_fetcher_spark import api  # noqa: E402
from block_data_fetcher_spark.session import get_spark  # noqa: E402
from block_data_fetcher_spark.streaming import jobs  # noqa: E402

DEFAULT = [
    "q_stream_tumbling",
    "q_stream_dedup",
    "q_stream_stream_join",
    "q_stream_late_data",
    "q_stream_curate",
    "q_stream_stateful",
    "q_stream_topk",
    "q_stream_upsert",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", default="")
    ap.add_argument(
        "--out",
        default=os.path.join(REPO, "plans", "r16", "stream_floor_profile.json"),
    )
    args = ap.parse_args()
    targets = [t for t in args.only.split(",") if t] or DEFAULT

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bdf-stream-floor")
    spark.sparkContext.setLogLevel("ERROR")
    queries = api.queries()

    # Capture per-run lifecycle segments via the await hook.
    seg: dict[str, list[dict]] = {}
    fn_entry_t = {"t": 0.0}
    orig_await = jobs._await_bounded

    def hooked(q, name, timeout=3600):
        t_await0 = time.perf_counter()
        orig_await(q, name, timeout)
        t_await1 = time.perf_counter()
        prog = []
        for p in q.recentProgress:
            try:
                prog.append(json.loads(p.json) if not isinstance(p, dict) else p)
            except Exception:
                pass
        trig_ms = sum(
            (p.get("durationMs") or {}).get("triggerExecution") or 0
            for p in prog
        )
        detail = {
            k: sum((p.get("durationMs") or {}).get(k) or 0 for p in prog)
            for k in (
                "addBatch",
                "getBatch",
                "latestOffset",
                "queryPlanning",
                "walCommit",
                "commitOffsets",
            )
        }
        seg.setdefault("_cur", []).append(
            {
                "stream": name,
                "build_start_s": round(t_await0 - fn_entry_t["t"], 3),
                "await_s": round(t_await1 - t_await0, 3),
                "trigger_ms": trig_ms,
                "n_progress": len(prog),
                "durationMs": detail,
            }
        )
        fn_entry_t["t"] = t_await1  # next stream in the same query

    jobs._await_bounded = hooked

    # bench-identical warm-up (streaming machinery included)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import tempfile
    import uuid

    sink = f"warmup_{uuid.uuid4().hex[:8]}"
    (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .groupBy("value")
        .count()
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_warm_"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(60)
    )

    results: dict[str, dict] = {}
    for name in targets:
        fn = queries[name]
        runs = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} floor rep{rep}")
            seg.pop("_cur", None)
            t0 = time.perf_counter()
            fn_entry_t["t"] = t0
            df = fn(spark, sf_dir)
            t_done = time.perf_counter()
            n = df.count()
            t_read = time.perf_counter()
            streams = seg.pop("_cur", [])
            runs.append(
                {
                    "wall_s": round(t_read - t0, 3),
                    "fn_s": round(t_done - t0, 3),
                    "readback_s": round(t_read - t_done, 3),
                    "rows": n,
                    "n_streams": len(streams),
                    "streams": streams,
                }
            )
        warm = runs[1:] or runs
        results[name] = {
            "runs": runs,
            "warm_wall_median_s": round(
                statistics.median(r["wall_s"] for r in warm), 3
            ),
            "warm_trigger_ms_median": round(
                statistics.median(
                    sum(s["trigger_ms"] for s in r["streams"]) for r in warm
                ),
                1,
            ),
        }
        sys.stderr.write(
            f"{name}: walls {[r['wall_s'] for r in runs]} "
            f"trigger_ms {[sum(s['trigger_ms'] for s in r['streams']) for r in runs]}\n"
        )

    jobs._await_bounded = orig_await
    out = {"sf_dir": sf_dir, "reps": args.reps, "results": results}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: v["warm_wall_median_s"] for k, v in results.items()}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
