#!/bin/bash
# Parameterized round-close proof pass: `bash scripts/round_close.sh r15`.
# Generalizes round14_close.sh (the first close script whose every step
# ran green end-to-end). Ordering rules, learned the hard way:
#  * quiet-box sf0.1 bench BEFORE the sf100 decade pass (r12: post-
#    decade fsync latency inflated the streaming family up to 8x);
#  * the WHOLE script runs in the FIRST half of the round (VERDICT r13
#    item 4: the driver's end-of-round BENCH line was inflated three
#    rounds running by co-located heavy work — the decade pass must be
#    long finished before the driver's bench window opens);
#  * a FAILED prelude step sets a fail flag and the ~4 h decade pass
#    ABORTS instead of launching on top of a broken prelude;
#  * BENCH_DETAIL.json is removed before every bench step, so a step
#    that exits 0 without writing can't be attested by a stale artifact.
set -uo pipefail
RN="${1:?usage: round_close.sh <round-tag, e.g. r15>}"
cd "$(dirname "$0")/.."
LOGD=".localdata/close_$RN"
mkdir -p "$LOGD"
FAILED=0

step() { # step <name> <expected-artifact-or-"-"> <cmd...>
  local name="$1" artifact="$2" rc; shift 2
  echo "== $name =="
  "$@" 2>"$LOGD/$name.log"; rc=$?
  if [ "$rc" -ne 0 ]; then
    echo "$name FAILED (exit $rc) — see $LOGD/$name.log"
    tail -5 "$LOGD/$name.log"
    FAILED=1
    return 1
  fi
  if [ "$artifact" != "-" ] && [ ! -s "$artifact" ]; then
    echo "$name FAILED — artifact $artifact missing/empty; see $LOGD/$name.log"
    FAILED=1
    return 1
  fi
  return 0
}

bench_step() { # bench_step <name> <artifact> <cmd...> — fresh detail file
  rm -f BENCH_DETAIL.json
  step "$@"
}

echo "== 0. full pytest (sf0.001) =="
python -m pytest tests/ -q 2>"$LOGD/pytest.log" | tail -3 \
  || { echo "pytest FAILED — see $LOGD/pytest.log"; FAILED=1; }

# 1. QUIET-BOX sf0.1 bench first (the ledger line).
bench_step bench_sf01 BENCH_DETAIL.json python bench.py \
  && cp BENCH_DETAIL.json "BENCH_QUIET_SF01_$RN.json" \
  && tail -1 BENCH_HISTORY.jsonl | python -c \
    'import json,sys; d=json.loads(sys.stdin.read()); print({"sf":d["sf"],"value":d.get("value"),"n_failed":d["n_failed"]})'

# 2-4. full-catalog hash gates (driver harness replica) + multi-node.
step gate_sf001 "GATE_SF001_$RN.json" \
  python scripts/driver_gate.py --sf-dir /root/testdata/sf0.01 \
    --out "GATE_SF001_$RN.json" && tail -2 "$LOGD/gate_sf001.log" || true

step gate_sf01 "GATE_SF01_$RN.json" \
  python scripts/driver_gate.py --sf-dir /root/testdata/sf0.1 \
    --out "GATE_SF01_$RN.json"

step gate_cluster "GATE_CLUSTER_SF01_$RN.json" \
  python scripts/driver_gate.py --sf-dir /root/testdata/sf0.1 \
    --master 'local-cluster[2,2,4096]' \
    --out "GATE_CLUSTER_SF01_$RN.json"

step compare_gates "GATE_COMPARE_SF01_$RN.json" bash -c \
  "python scripts/compare_gates.py GATE_SF01_$RN.json \
     GATE_CLUSTER_SF01_$RN.json > GATE_COMPARE_SF01_$RN.json" \
  && head -c 400 "GATE_COMPARE_SF01_$RN.json" && echo

# 5. The decade pass — ~4 h, gated on everything above being green.
if [ "$FAILED" -ne 0 ]; then
  echo "== ABORT: a prelude step failed; NOT launching the sf100 pass =="
  exit 1
fi
echo "== 5. sf100 decade pass =="
bench_step bench_sf100 BENCH_DETAIL.json env \
  SPARK_GRAFT_SF_DIR=.localdata/sf100 SPARK_GRAFT_CPUS=32 \
  python bench.py \
  && cp BENCH_DETAIL.json "BENCH_SF100_$RN.json"

step check_sf100 - python scripts/check_sf100.py

# 6. Post-decade streaming probe: the streaming family re-run
#    immediately after the decade pass must stay within ~1.5x of the
#    quiet-box walls (the tmpfs-checkpoint acceptance test).
bench_step stream_probe BENCH_DETAIL.json env \
  SPARK_GRAFT_ONLY=q_stream_tumbling,q_stream_sliding,q_stream_session,q_stream_dedup,q_stream_upsert,q_stream_cdc,q_stream_stream_join,q_stream_incremental_agg \
  python bench.py \
  && cp BENCH_DETAIL.json "STREAM_POSTDECADE_$RN.json"

exit "$FAILED"
