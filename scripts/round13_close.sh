#!/bin/bash
# Round-13 close-out. ORDERING IS THE POINT (VERDICT r12 item 2): the
# quiet-box sf0.1 bench runs BEFORE the sf100 decade pass so the
# BENCH_HISTORY sf0.1 line is never again inflated by post-decade IO
# degradation (r12 recorded 290 s on a device with 126-189 ms fsync
# right after a 4 h pass; the quiet-box number is ~240 s).
#
# Error surfacing (ADVICE r12): every step keeps its stderr in
# .localdata/close_r13/<step>.log and prints a FAILED marker on a
# nonzero exit or a missing artifact — a crashed gate can no longer
# look like a clean summary.
set -uo pipefail
cd "$(dirname "$0")/.."
LOGD=.localdata/close_r13
mkdir -p "$LOGD"

step() { # step <name> <expected-artifact-or-"-"> <cmd...>
  local name="$1" artifact="$2" rc; shift 2
  echo "== $name =="
  "$@" 2>"$LOGD/$name.log"; rc=$?
  if [ "$rc" -ne 0 ]; then
    echo "$name FAILED (exit $rc) — see $LOGD/$name.log"
    tail -5 "$LOGD/$name.log"
    return 1
  fi
  if [ "$artifact" != "-" ] && [ ! -s "$artifact" ]; then
    echo "$name FAILED — artifact $artifact missing/empty; see $LOGD/$name.log"
    return 1
  fi
  return 0
}

echo "== 0. full pytest (sf0.001) =="
python -m pytest tests/ -q 2>"$LOGD/pytest.log" | tail -3 \
  || echo "pytest FAILED — see $LOGD/pytest.log"

# 1. QUIET-BOX sf0.1 bench first (the ledger line).
step bench_sf01 BENCH_DETAIL.json python bench.py \
  && tail -1 BENCH_HISTORY.jsonl | python -c \
    'import json,sys; d=json.loads(sys.stdin.read()); print({"sf":d["sf"],"value":d.get("value"),"n_failed":d["n_failed"]})'

step gate_sf001 GATE_SF001_r13.json \
  python scripts/driver_gate.py --sf-dir /root/testdata/sf0.01 \
    --out GATE_SF001_r13.json && tail -2 "$LOGD/gate_sf001.log" || true

step gate_sf01 GATE_SF01_r13.json \
  python scripts/driver_gate.py --sf-dir /root/testdata/sf0.1 \
    --out GATE_SF01_r13.json

step gate_cluster GATE_CLUSTER_SF01_r13.json \
  python scripts/driver_gate.py --sf-dir /root/testdata/sf0.1 \
    --master 'local-cluster[2,2,4096]' \
    --out GATE_CLUSTER_SF01_r13.json

step compare_gates GATE_COMPARE_SF01_r13.json bash -c \
  "python scripts/compare_gates.py GATE_SF01_r13.json \
     GATE_CLUSTER_SF01_r13.json > GATE_COMPARE_SF01_r13.json" \
  && head -c 400 GATE_COMPARE_SF01_r13.json && echo

# 5. The decade pass LAST — ~4 h; self-sufficient on disk now
#    (bench.py stale-shuffle sweep + disk_timeline). No other work on
#    the box while it runs.
echo "== 5. sf100 decade pass =="
step bench_sf100 BENCH_DETAIL.json env \
  SPARK_GRAFT_SF_DIR=.localdata/sf100 SPARK_GRAFT_CPUS=32 \
  python bench.py \
  && cp BENCH_DETAIL.json BENCH_SF100_r13.json

step check_sf100 - python scripts/check_sf100.py

# 6. Post-decade streaming probe (VERDICT r12 item 5 "done" test):
#    the streaming family re-run immediately after the decade pass
#    must stay within ~1.5x of the quiet-box walls now that
#    checkpoints live on tmpfs.
step stream_probe BENCH_DETAIL.json env \
  SPARK_GRAFT_ONLY=q_stream_tumbling,q_stream_sliding,q_stream_session,q_stream_dedup,q_stream_upsert,q_stream_cdc,q_stream_stream_join,q_stream_incremental_agg \
  python bench.py \
  && cp BENCH_DETAIL.json STREAM_POSTDECADE_r13.json
