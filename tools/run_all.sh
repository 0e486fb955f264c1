#!/usr/bin/env bash
# One-command repro driver (VERDICT r8 #7): regenerates every round
# artifact deterministically — correctness gate (both scales), bench
# suite, plan dump — so "what the repo claims" is always one command
# away from "what the code does", never last-run-wins.
#
#   tools/run_all.sh            # gate @ sf0.01 + sf0.1, bench @ sf0.1, plans
#   tools/run_all.sh quick      # gate @ sf0.01 only, no bench
#
# Bench passes merge best-of-samples per code state (see Bench.scala);
# run the script twice for a tighter committed bench_out.json.
set -euo pipefail
cd "$(dirname "$0")/.."
MODE="${1:-full}"

echo "=== compile + test ==="
sbt -batch compile test

echo "=== correctness gate @ sf0.01 ==="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_gate_sf001"
python3 tools/local_verify.py /root/testdata/sf0.01 /tmp/graft_gate_sf001

if [ "$MODE" = "full" ]; then
  echo "=== correctness gate @ sf0.1 ==="
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/graft_gate_sf01"
  python3 tools/local_verify.py /root/testdata/sf0.1 /tmp/graft_gate_sf01

  echo "=== bench suite @ sf0.1 (writes bench_out.json) ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench"

  echo "=== plan dump (rewrites PLANS.md) ==="
  sbt -batch "runMain graft.tools.PlanDump"
fi

echo "=== artifacts ==="
git status --short bench_out.json PLANS.md || true
echo "run_all: done ($MODE)"
