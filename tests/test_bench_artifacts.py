"""Bench artifact contract (r10 VERDICT items 2/5/7): the summary line
and BENCH_DETAIL.json must carry execution-mode provenance, the
query-time/harness-time split, and CC convergence telemetry — these are
the fields round-over-round comparisons and multi-node claims rest on,
so a refactor that drops one must fail here, not in the next verdict.

One subprocess run of the real bench.py (subset mode, sf0.001) checks
all of it; the subset marker must also survive so a partial run can
never masquerade as a full-catalog number.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_summary_and_detail_carry_contract_fields(tmp_path):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_ONLY="q_group_count,q_dup_clusters",
        SPARK_GRAFT_CPUS="4",
        # hermetic artifacts: never touch the repo-root BENCH_* files a
        # concurrently-running real bench may be writing incrementally
        SPARK_GRAFT_OUT_DIR=str(tmp_path),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])

    # provenance: execution mode provable from the artifact alone
    assert summary["n_failed"] == 0
    assert summary["subset"] is True
    # query-vs-harness wall split
    assert summary["value"] >= summary["query_sec"] > 0
    assert summary["harness_overhead_sec"] >= 0

    detail = json.load(open(os.path.join(str(tmp_path), "BENCH_DETAIL.json")))
    for k in ("master", "run_id", "spark_version", "host", "host_cpus"):
        assert detail.get(k), f"missing provenance field {k}"
    assert detail["master"].startswith("local")
    assert set(detail["queries"]) == {"q_group_count", "q_dup_clusters"}
    # CC telemetry rides the artifact for the CC-family query only
    assert "q_dup_clusters" in detail["cc_stats"], detail["cc_stats"]
    cc = detail["cc_stats"]["q_dup_clusters"]
    assert cc["rounds"] >= 1 and cc["reason"] in (
        "converged",
        "stalled",
        "budget",
    )
    assert "q_group_count" not in detail["cc_stats"]
    assert detail["subset"] is True
    # free-disk timeline (r13, VERDICT r12 item 3): one sample per
    # query so decade-pass artifacts show the shuffle plateau shape
    tl = detail["disk_timeline"]
    assert [e["q"] for e in tl] == sorted(detail["queries"])
    assert all(e["free_gb"] > 0 and e["t_sec"] >= 0 for e in tl)


def test_sweep_stale_shuffle_unlinks_only_old_shuffle_files(
    tmp_path, monkeypatch
):
    """The in-harness stale-shuffle sweep (r13, VERDICT r12 item 3)
    must remove shuffle_* files older than the age bound and NOTHING
    else — younger shuffle files and rdd_/broadcast_ blocks (checkpoint
    lineage, cached frames) stay."""
    import time as _t

    sys.path.insert(0, REPO)
    import bench

    sub = tmp_path / "blockmgr-test" / "0a"
    sub.mkdir(parents=True)
    old_shuffle = sub / "shuffle_1_2_0.data"
    new_shuffle = sub / "shuffle_9_0_0.data"
    old_rdd = sub / "rdd_3_7"
    for p in (old_shuffle, new_shuffle, old_rdd):
        p.write_bytes(b"x" * 16)
    stale = _t.time() - bench.STALE_SHUFFLE_AGE_SEC - 60
    os.utime(old_shuffle, (stale, stale))
    os.utime(old_rdd, (stale, stale))
    monkeypatch.setattr(
        bench, "_blockmgr_dirs", lambda _spark: [str(tmp_path)]
    )
    n, freed = bench._sweep_stale_shuffle(spark=None)
    assert (n, freed) == (1, 16)
    assert not old_shuffle.exists()
    assert new_shuffle.exists() and old_rdd.exists()


def test_sweep_protect_after_spares_recent_query_files(
    tmp_path, monkeypatch
):
    """ADVICE r13: the 45-min age bound alone would delete a slow
    query's own early shuffle files; the run loop passes the previous
    query's start time and the sweep must never unlink anything
    written at or after it, no matter how stale the age bound says."""
    import time as _t

    sys.path.insert(0, REPO)
    import bench

    sub = tmp_path / "blockmgr-test" / "0a"
    sub.mkdir(parents=True)
    f = sub / "shuffle_1_0_0.data"
    f.write_bytes(b"x" * 16)
    stale = _t.time() - bench.STALE_SHUFFLE_AGE_SEC - 60
    os.utime(f, (stale, stale))
    monkeypatch.setattr(
        bench, "_blockmgr_dirs", lambda _spark: [str(tmp_path)]
    )
    # previous query started before the file was written -> protected
    n, _ = bench._sweep_stale_shuffle(spark=None, protect_after=stale - 1)
    assert n == 0 and f.exists()
    # previous query started after -> eligible again
    n, _ = bench._sweep_stale_shuffle(spark=None, protect_after=stale + 61)
    assert n == 1 and not f.exists()


def test_blockmgr_lookup_failure_skips_sweep(tmp_path, monkeypatch):
    """ADVICE r13 (medium): when the DiskBlockManager lookup fails,
    the sweep must be SKIPPED — the old tempdir blockmgr-* glob could
    unlink a DIFFERENT live Spark process's shuffle files."""
    sys.path.insert(0, REPO)
    import tempfile as _tf

    import bench

    monkeypatch.setattr(_tf, "gettempdir", lambda: str(tmp_path))
    decoy = tmp_path / "blockmgr-otherproc" / "0b"
    decoy.mkdir(parents=True)
    other = decoy / "shuffle_5_0_0.data"
    other.write_bytes(b"y" * 8)
    old = __import__("time").time() - bench.STALE_SHUFFLE_AGE_SEC - 60
    os.utime(other, (old, old))
    assert bench._blockmgr_dirs(None) == []  # py4j path unavailable
    n, freed = bench._sweep_stale_shuffle(spark=None)
    assert (n, freed) == (0, 0)
    assert other.exists()
