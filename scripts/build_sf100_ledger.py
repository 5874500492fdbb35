"""Build the canonical sf100 per-query ledger (SF100_LEDGER.json).

VERDICT r13 item 5: the r9 "union" baseline — a best-of-SEVEN minimum
per query assembled under box conditions that no longer exist — is
dead as a comparison target. The r13 A/B proved it: an r9-era checkout
reproduces HEAD's walls on today's box (SF100_REMEASURE_r13.json
ab_r9_checkout), so the residual "regressions" vs that union were
ledger/box drift, not code. This script re-bases the ledger on
CURRENT-BOX evidence only:

* ``warm_median`` from the newest SF100_REMEASURE_r<N>.json that
  covers the query (5x-warm fresh-JVM quiet-box — the highest-quality
  number we have; files are applied in ascending NUMERIC round order
  so a newer round's median supersedes an older one's), else
* the minimum over every COMPLETE single-pass sf100 line in
  BENCH_HISTORY.jsonl (``n_failed == 0``; crashed/partial-load passes
  contribute unrepresentative walls and are skipped — ADVICE r14) —
  each is a real achieved-on-this-box wall from a full 254-query pass.

Queries present in only one pass keep that pass's number. Failures
(<= 0) never enter the ledger. Output carries per-query provenance
("remeasure" | "pass_<ts>" — the timestamp of the contributing pass)
so a future re-base can tell which numbers are quiet-box medians and
which are in-pass walls.

Usage: python scripts/build_sf100_ledger.py [--exclude-ts TS ...]
(writes SF100_LEDGER.json). Pass --exclude-ts with the timestamp of
the run about to be COMPARED against the ledger, so the comparison is
never self-referential (ADVICE r14: the r14 ledger included the r14
pass itself, making 63 of its SF100_COMPARE ratios exactly 1.0).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--exclude-ts",
        action="append",
        default=[],
        help="timestamp(s) of pass lines to exclude (the run being "
        "compared against the rebuilt ledger must not contribute "
        "its own baselines)",
    )
    args = ap.parse_args()

    passes: list[dict] = []
    skipped: list[dict] = []
    with open(os.path.join(REPO, "BENCH_HISTORY.jsonl")) as f:
        for line in f:
            d = json.loads(line)
            if (
                d.get("sf") == 100.0
                and not d.get("combined_from_runs")
                and not d.get("subset")
                and not d.get("partial")
            ):
                # ADVICE r14: a crashed pass (n_failed > 0) mixes
                # partial-load-session walls into the ledger; only
                # complete passes qualify. Excluded-ts lines are the
                # run about to be compared — self-comparison makes
                # the reported median partly tautological.
                if d.get("n_failed", 0) != 0 or str(d.get("ts")) in set(
                    args.exclude_ts
                ):
                    skipped.append(
                        {"ts": d.get("ts"), "n_failed": d.get("n_failed")}
                    )
                    continue
                passes.append(d)
    if not passes:
        print(json.dumps({"ok": False, "reason": "no sf100 pass lines"}))
        return 1
    # All quiet-box remeasure artifacts, ascending NUMERIC round order
    # so a NEWER warm median supersedes an older one for the same
    # query (lexicographic sort puts r9 after r14 — ADVICE r14).
    remeasure = {}
    # The glob also admits non-numeric suffixes (SF100_REMEASURE_rX.json)
    # — skip those instead of crashing on .group(1) of a None match
    # (ADVICE r15).
    rm_candidates = []
    for p in glob.glob(os.path.join(REPO, "SF100_REMEASURE_r*.json")):
        m = re.search(r"_r(\d+)\.json$", p)
        if m:
            rm_candidates.append((int(m.group(1)), p))
        else:
            print(f"ignoring non-numeric remeasure artifact: {p}", file=sys.stderr)
    rm_paths = [p for _, p in sorted(rm_candidates)]
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
        "skipped_passes": skipped,
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
