#!/bin/bash
# Round-12 close-out: run AFTER the sf100 single-pass bench exits.
# Produces the r12 gate artifacts and prints a summary; safe to re-run.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "== 1. sf100 single-pass validator =="
python scripts/check_sf100.py || echo "check_sf100 FAILED"

echo "== 2. full pytest (sf0.001) =="
python -m pytest tests/ -q 2>&1 | tail -3

echo "== 3. driver gate sf0.01 =="
python scripts/driver_gate.py --sf-dir /root/testdata/sf0.01 \
  --out GATE_SF001_r12.json 2>/dev/null | tail -2

echo "== 4. driver gate sf0.1 =="
python scripts/driver_gate.py --sf-dir /root/testdata/sf0.1 \
  --out GATE_SF01_r12.json 2>/dev/null | tail -2

echo "== 5. cluster gate sf0.1 (local-cluster[2,2,4096]) =="
python scripts/driver_gate.py --sf-dir /root/testdata/sf0.1 \
  --master 'local-cluster[2,2,4096]' \
  --out GATE_CLUSTER_SF01_r12.json 2>/dev/null | tail -2

echo "== 6. local vs cluster comparison =="
python scripts/compare_gates.py GATE_SF01_r12.json \
  GATE_CLUSTER_SF01_r12.json > GATE_COMPARE_SF01_r12.json \
  && head -c 600 GATE_COMPARE_SF01_r12.json
