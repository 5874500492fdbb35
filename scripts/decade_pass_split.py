#!/usr/bin/env python3
"""The sf100 decade pass, split across fresh JVM sessions (VERDICT r14
item 1 / r15 item 1 — the session-split A/B against the single-JVM
recipe).

Why split: the r14 single-JVM pass held one blockmgr alive for 3.6 h —
1,271.8 s of explicit hygiene overhead (GC waits, stale-shuffle sweeps)
existed ONLY to keep that JVM from ENOSPCing, and the in-pass
adjacency audit showed ten queries running 1.7-3.7x their fresh-JVM
warm medians. Fresh sessions per slice remove both causes: each
slice's shuffle files die with its JVM, and no query inherits 200
predecessors' heap/codegen/cleaner state.

Mechanics: the catalog is split into N contiguous alphabetical slices
(contiguity preserves bench.py's in-slice ordering); each slice runs
``SPARK_GRAFT_ONLY=<slice> python bench.py`` in its own process
against the sf100 fixture; the per-slice BENCH_DETAIL.json artifacts
are merged into one full-catalog line (marked ``combined_from_runs`` +
``split_sessions`` — never mistakable for a single-JVM pass) appended
to BENCH_HISTORY.jsonl and written to BENCH_SF100_<tag>.json.

Also records, per VERDICT r15 item 1, the scale-gate provenance at
sf100 BEFORE the pass (tmpfs scratch OFF, RocksDB state ON, iterative
loops keep AQE) to plans/r16/sf100_knob_provenance.json.

Usage:
  python scripts/decade_pass_split.py [--sessions 3] [--tag r16] \
      [--sf-dir .localdata/sf100] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def knob_provenance(sf_dir: str) -> dict:
    """One line per r15 scale gate, evaluated exactly as the engine
    will during the pass (fixture noted first, like api._tuned does)."""
    from block_data_fetcher_spark import scratch
    from block_data_fetcher_spark.functions import hashing
    from block_data_fetcher_spark.streaming import jobs

    scratch.note_fixture_dir(sf_dir)
    base = scratch.scratch_base()
    prov = {
        "sf_dir": os.path.abspath(sf_dir),
        "fixture_bytes": scratch._fixture_bytes(),
        "scratch_base": base,
        "scratch_on_tmpfs": base.startswith("/dev/shm"),
        "state_provider_events": jobs._state_provider(sf_dir),
        "state_provider_is_rocksdb": "RocksDB"
        in jobs._state_provider(sf_dir),
        "iter_dim_sized_rows_threshold": hashing.ITER_DIM_SIZED_ROWS,
        # The CC candidate graph at sf100 measured ~455M pairs (r9) —
        # far over the 50k static-DAG gate, so loops keep AQE + sized
        # partitions. The gate keys on the per-loop MEASURED working
        # set; this records the threshold next to the fixture size so
        # the claim is checkable.
    }
    return prov


def run_slice(i: int, names: list[str], sf_dir: str, cpus: int,
              logdir: str) -> dict:
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    if os.path.exists(detail_path):
        os.remove(detail_path)
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_ONLY=",".join(names),
    )
    log = os.path.join(logdir, f"slice{i}.log")
    t0 = time.time()
    with open(log, "w") as lf:
        rc = subprocess.call(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            stdout=lf,
            stderr=subprocess.STDOUT,
            cwd=REPO,
        )
    wall = round(time.time() - t0, 1)
    if rc != 0 or not os.path.exists(detail_path):
        raise SystemExit(
            f"slice {i} failed (rc={rc}); see {log} (tail: "
            f"{open(log).read()[-500:]!r})"
        )
    with open(detail_path) as f:
        d = json.load(f)
    d["_slice_wall_s"] = wall
    d["_slice_log"] = log
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=3)
    ap.add_argument("--tag", default="r16")
    ap.add_argument("--sf-dir", default=".localdata/sf100")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from block_data_fetcher_spark import api

    names = sorted(api.queries())
    n = args.sessions
    bounds = [round(i * len(names) / n) for i in range(n + 1)]
    slices = [names[bounds[i]: bounds[i + 1]] for i in range(n)]

    prov = knob_provenance(args.sf_dir)
    os.makedirs(os.path.join(REPO, "plans", "r16"), exist_ok=True)
    with open(
        os.path.join(REPO, "plans", "r16", "sf100_knob_provenance.json"), "w"
    ) as f:
        json.dump(prov, f, indent=1, sort_keys=True)
    print("knob provenance:", json.dumps(prov), flush=True)
    if prov["scratch_on_tmpfs"] or not prov["state_provider_is_rocksdb"]:
        raise SystemExit("scale gates did NOT flip to production posture")

    logdir = os.path.join(REPO, ".localdata", f"decade_{args.tag}")
    os.makedirs(logdir, exist_ok=True)

    details = []
    t0 = time.time()
    for i, sl in enumerate(slices):
        print(
            f"slice {i}: {len(sl)} queries [{sl[0]} .. {sl[-1]}]",
            flush=True,
        )
        d = run_slice(i, sl, args.sf_dir, args.cpus, logdir)
        with open(
            os.path.join(logdir, f"slice{i}_detail.json"), "w"
        ) as f:
            json.dump(d, f, indent=1, sort_keys=True)
        print(
            f"slice {i}: wall {d['_slice_wall_s']} s, bench value "
            f"{d['value']} s, n_failed {d['n_failed']}",
            flush=True,
        )
        details.append(d)
    total_wall = round(time.time() - t0, 1)

    merged_q: dict[str, float] = {}
    stream_stats: dict = {}
    cc_stats: dict = {}
    disk_timeline: list = []
    for d in details:
        merged_q.update(d["queries"])
        stream_stats.update(d.get("stream_stats", {}))
        cc_stats.update(d.get("cc_stats", {}))
        disk_timeline.extend(d.get("disk_timeline", []))
    query_sec = round(sum(v for v in merged_q.values() if v >= 0), 3)
    bench_sum = round(sum(d["value"] for d in details), 3)
    merged = {
        "metric": "catalog_wall_clock",
        "value": bench_sum,
        "unit": "sec",
        "query_sec": query_sec,
        "harness_overhead_sec": round(bench_sum - query_sec, 3),
        "queries": merged_q,
        "stream_stats": stream_stats,
        "cc_stats": cc_stats,
        "disk_timeline": disk_timeline,
        "sf": details[0].get("sf"),
        "n_failed": sum(1 for v in merged_q.values() if v < 0),
        "combined_from_runs": [d.get("run_id") for d in details],
        "split_sessions": n,
        "slice_walls_s": [d["_slice_wall_s"] for d in details],
        "process_wall_s": total_wall,
        "master": details[0].get("master"),
        "run_id": details[0].get("run_id"),
        "spark_version": details[0].get("spark_version"),
        "host": details[0].get("host"),
        "host_cpus": details[0].get("host_cpus"),
    }
    out = os.path.join(REPO, f"BENCH_SF100_{args.tag}.json")
    with open(out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    with open(os.path.join(REPO, "BENCH_HISTORY.jsonl"), "a") as f:
        f.write(
            json.dumps(
                {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), **merged},
                sort_keys=True,
            )
            + "\n"
        )
    print(
        json.dumps(
            {
                "n_queries": len(merged_q),
                "n_failed": merged["n_failed"],
                "bench_sum_s": bench_sum,
                "query_sec": query_sec,
                "process_wall_s": total_wall,
                "slice_walls_s": merged["slice_walls_s"],
                "artifact": out,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
