"""Round-close validator for the single-pass sf100 ledger line
(VERDICT r10 item 1 — the done-criteria, checked mechanically):

* ONE fresh BENCH_HISTORY.jsonl line with sf == 100, no
  ``combined_from_runs``, no ``subset``, no ``partial``, n_failed == 0;
* stream entries show multi-batch ingestion (``n_batches > 1``) with a
  state plateau (peak state rows well under input rows) — the r9 item-4
  eviction criterion AT the decade, not just sf10;
* ``q_dup_clusters`` <= 2x ``q_cc_star`` wall — the r9 item-6 criterion
  for the adaptive contract-then-star escape;
* provenance fields present (master / run_id / spark_version).

Prints a JSON verdict line; exit 0 iff every criterion holds.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    last_sf100 = None
    with open(os.path.join(REPO, "BENCH_HISTORY.jsonl")) as f:
        for line in f:
            d = json.loads(line)
            if d.get("sf") == 100.0:
                last_sf100 = d
    checks: dict[str, bool | str] = {}
    if last_sf100 is None:
        print(json.dumps({"ok": False, "reason": "no sf100 line"}))
        return 1
    d = last_sf100
    checks["single_pass"] = (
        "combined_from_runs" not in d
        and not d.get("subset")
        and not d.get("partial")
    )
    checks["n_failed_zero"] = d.get("n_failed") == 0
    checks["n_queries"] = len(d.get("queries", {}))
    checks["provenance"] = all(
        k in d for k in ("master", "run_id", "spark_version")
    )

    ss = d.get("stream_stats", {})
    multi = {
        k: v
        for k, v in ss.items()
        if isinstance(v, dict) and v.get("n_batches", 0) > 1
    }
    checks["streams_multi_batch"] = bool(multi)
    # Eviction evidence: at least one multi-batch stateful stream
    # actually removed state between batches (the plateau — without
    # eviction, peak == total input and removed == 0).
    checks["streams_evicting"] = sorted(
        k for k, v in multi.items() if (v.get("state_rows_removed") or 0) > 0
    )
    checks["stream_stats_multi"] = {
        k: {
            "n_batches": v.get("n_batches"),
            "state_rows_peak": v.get("state_rows_peak"),
            "state_rows_removed": v.get("state_rows_removed"),
            "rows_dropped_late": v.get("rows_dropped_late"),
        }
        for k, v in multi.items()
    }

    q = d.get("queries", {})
    dup, star = q.get("q_dup_clusters"), q.get("q_cc_star")
    if dup and star and dup > 0 and star > 0:
        checks["dup_clusters_over_cc_star"] = round(dup / star, 2)
        # r13 bar (VERDICT r12 item 4): with the edge-threshold routing
        # q_dup_clusters runs star outright at the decade, so the old
        # <=2x escape allowance tightens to <=1.5x.
        checks["dup_le_1_5x_star"] = dup <= 1.5 * star
    else:
        checks["dup_le_1_5x_star"] = False
    cc = d.get("cc_stats", {})
    checks["cc_stats"] = cc
    # r13 bar: no CC-family query may ride the mid-run escape hatch at
    # the decade — big graphs must be ROUTED to star from round one.
    checks["cc_no_escapes"] = bool(cc) and not any(
        v.get("escaped") for v in cc.values() if isinstance(v, dict)
    )

    hard = [
        checks["single_pass"],
        checks["n_failed_zero"],
        checks["provenance"],
        checks["streams_multi_batch"],
        bool(checks["streams_evicting"]),
        checks["dup_le_1_5x_star"],
        checks["cc_no_escapes"],
    ]
    out = {"ok": all(bool(x) for x in hard), **checks}
    print(json.dumps(out, sort_keys=True))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
