"""Side-by-side per-query Spark wall comparison of two gate artifacts
(r10 VERDICT item 4: "record per-query wall next to the local[32]
numbers — serialization-heavy plans will show").

Usage:
    python scripts/compare_gates.py GATE_A.json GATE_B.json [--top 15]

Prints one JSON line: provenance of both runs, total Spark wall each,
and the top-N queries by B/A wall ratio (the plans most sensitive to
whatever differs between the runs — master, scale, concurrency).
Queries faster than FLOOR_SEC in BOTH runs are excluded from the
ratio ranking: sub-100 ms walls are scheduler noise, not plan signal.
"""

from __future__ import annotations

import argparse
import json

FLOOR_SEC = 0.25


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("gate_a")
    ap.add_argument("gate_b")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    a, b = load(args.gate_a), load(args.gate_b)
    qa = {
        k: v.get("spark_wall_sec")
        for k, v in a.get("queries", {}).items()
        if v.get("spark_wall_sec") is not None
    }
    qb = {
        k: v.get("spark_wall_sec")
        for k, v in b.get("queries", {}).items()
        if v.get("spark_wall_sec") is not None
    }
    shared = sorted(set(qa) & set(qb))
    ranked = sorted(
        (
            (round(qb[k] / max(qa[k], 1e-9), 2), k)
            for k in shared
            if max(qa[k], qb[k]) >= FLOOR_SEC
        ),
        reverse=True,
    )
    out = {
        "a": {
            "path": args.gate_a,
            "master": a.get("master"),
            "sf_dir": a.get("sf_dir"),
            "n_failed": a.get("n_failed"),
            "spark_wall_sum_sec": round(sum(qa.values()), 1),
        },
        "b": {
            "path": args.gate_b,
            "master": b.get("master"),
            "sf_dir": b.get("sf_dir"),
            "n_failed": b.get("n_failed"),
            "spark_wall_sum_sec": round(sum(qb.values()), 1),
        },
        "n_compared": len(shared),
        "ratio_median_b_over_a": (
            round(
                sorted(qb[k] / max(qa[k], 1e-9) for k in shared)[
                    len(shared) // 2
                ],
                3,
            )
            if shared
            else None
        ),
        "top_ratio_b_over_a": [
            {"query": k, "ratio": r, "a_sec": qa[k], "b_sec": qb[k]}
            for r, k in ranked[: args.top]
        ],
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
