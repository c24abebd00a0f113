#!/bin/bash
# The full round-close discipline in one command (VERDICT r6 item 3):
# fresh-JVM test suite, FULL Verify at sf0.01, the complete DuckDB
# check with per-oracle wall-clock (>10s = SLOW = bug), and the full
# sf0.1 bench. A round must not close on subset re-runs — a green
# subset hid the q116 oracle hang that zeroed round 6.
set -e -o pipefail
cd "$(dirname "$0")/.."
echo "== sbt test =="
sbt -batch test 2>&1 | tail -4
echo "== full Verify @ sf0.01 =="
rm -rf /tmp/verify_out spark-warehouse
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out" 2>&1 |
  { grep -E '\[verify\].*failed' || true; }
echo "== check.py =="
python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01 | tail -3
echo "== Bench @ sf0.1 =="
rm -rf spark-warehouse
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>&1 |
  grep '"metric"' | tail -1
echo "== ROUNDCHECK GREEN =="
