#!/bin/bash
# Fresh-JVM best-of-3 drift canary (VERDICT r8 item 1). Run at round
# open AND round close; diff the two records. A gate whose best-of-3
# moves >1.3x between records has a plan-level cause (host noise does
# not survive fresh-JVM best-of-3 on both sides); diff its
# .explain("formatted") against the recorded plan.
set -e -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/canary.json}
source "$(dirname "$0")/java_env.sh"
: > "$OUT.runs"
for i in 1 2 3; do
  rm -rf spark-warehouse
  SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
    java $GRAFT_JAVA_OPTS -cp "$GRAFT_CP" graft.Canary 2>/dev/null |
    grep -o '{"canary".*}' >> "$OUT.runs"
done
python3 - "$OUT" <<'EOF'
import json, sys
runs = [json.loads(l)["canary"] for l in open(sys.argv[1] + ".runs")]
best = {k: min(r[k] for r in runs) for k in runs[0]}
json.dump({"canary_best_of_3": best, "runs": len(runs)},
          open(sys.argv[1], "w"), indent=1)
print(json.dumps(best, indent=1))
EOF
