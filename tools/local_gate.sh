#!/bin/bash
# Local replica of everything the driver + judge check, in one command:
#
#   bash tools/local_gate.sh [sfDir]
#
#   1. sbt test            — all ScalaTest suites
#   2. Verify + DuckDB     — full-registry oracle gate (tools/check_oracle.py,
#                            incl. the dtype gate + pandas-mirror hash)
#   3. plan drift          — fresh DumpPlans vs committed PLANS.md
#                            (tools/plan_drift.py)
#
# Exit nonzero on the first failing stage. Run before every round-closing
# commit; stages 2–3 alone take ~4 min at sf0.01.
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}

echo "=== [1/3] sbt test ==="
sbt -batch test

echo "=== [2/3] oracle gate at $SF ==="
rm -rf /tmp/gate_verify
sbt -batch "runMain graft.Verify $SF /tmp/gate_verify"
python3 tools/check_oracle.py "$SF" /tmp/gate_verify

echo "=== [3/3] plan drift vs committed PLANS.md ==="
sbt -batch "runMain graft.DumpPlans /tmp/plans_fresh.md"
python3 tools/plan_drift.py PLANS.md /tmp/plans_fresh.md

echo "=== local gate green ==="
