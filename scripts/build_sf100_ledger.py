"""Build the canonical sf100 per-query ledger (SF100_LEDGER.json).

VERDICT r13 item 5: the r9 "union" baseline — a best-of-SEVEN minimum
per query assembled under box conditions that no longer exist — is
dead as a comparison target. The r13 A/B proved it: an r9-era checkout
reproduces HEAD's walls on today's box (SF100_REMEASURE_r13.json
ab_r9_checkout), so the residual "regressions" vs that union were
ledger/box drift, not code. This script re-bases the ledger on
CURRENT-BOX evidence only:

* ``warm_median`` from SF100_REMEASURE_r13.json where a query was
  re-measured (5x-warm fresh-JVM quiet-box — the highest-quality
  number we have), else
* ``min(r12 pass, r13 pass)`` over the single-pass sf100 lines in
  BENCH_HISTORY.jsonl — both are real achieved-on-this-box walls from
  full 254-query passes; taking the min of TWO recent runs avoids the
  r13 sink-pressure window inflating a baseline without re-creating
  the best-of-seven pathology.

Queries present in only one pass keep that pass's number. Failures
(<= 0) never enter the ledger. Output carries per-query provenance
("remeasure" | "r12_pass" | "r13_pass") so a future re-base can tell
which numbers are quiet-box medians and which are in-pass walls.

Usage: python scripts/build_sf100_ledger.py   (writes SF100_LEDGER.json)
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    passes: list[dict] = []
    with open(os.path.join(REPO, "BENCH_HISTORY.jsonl")) as f:
        for line in f:
            d = json.loads(line)
            if (
                d.get("sf") == 100.0
                and not d.get("combined_from_runs")
                and not d.get("subset")
                and not d.get("partial")
            ):
                passes.append(d)
    if not passes:
        print(json.dumps({"ok": False, "reason": "no sf100 pass lines"}))
        return 1
    # oldest-first; label by position (r12 pass, then r13 pass, ...)
    # All quiet-box remeasure artifacts, oldest-first by round suffix so
    # a NEWER warm median supersedes an older one for the same query.
    remeasure = {}
    rm_paths = sorted(glob.glob(os.path.join(REPO, "SF100_REMEASURE_r*.json")))
    for rm_path in rm_paths:
        rm = json.load(open(rm_path))
        for k, v in rm.get("queries", {}).items():
            if v.get("warm_median"):
                remeasure[k] = v["warm_median"]

    ledger: dict[str, float] = {}
    source: dict[str, str] = {}
    for k, v in remeasure.items():
        ledger[k] = v
        source[k] = "remeasure"
    for i, p in enumerate(passes):
        tag = f"pass_{p.get('ts', i)}"
        for k, v in p.get("queries", {}).items():
            if v is None or v <= 0 or k in remeasure:
                continue
            if k not in ledger or v < ledger[k]:
                ledger[k] = v
                source[k] = tag
    out = {
        "sf": 100.0,
        "note": (
            "canonical current-box sf100 ledger (r14 re-base; VERDICT "
            "r13 item 5): remeasure warm medians where available, else "
            "min over the recorded single-pass lines; r9 union retired"
        ),
        "built_from_passes": [
            {"ts": p.get("ts"), "run_id": p.get("run_id"),
             "value": p.get("value")}
            for p in passes
        ],
        "n_queries": len(ledger),
        "queries": ledger,
        "source": source,
    }
    path = os.path.join(REPO, "SF100_LEDGER.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"ok": True, "n_queries": len(ledger), "path": path}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
