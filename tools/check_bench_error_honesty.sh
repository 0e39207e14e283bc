#!/usr/bin/env bash
# Verifies Bench's error-honest artifact contract (round-10 post-mortem):
# a query that throws must land in "errored"/"errors", contribute NOTHING
# to "queries"/total/vs_frozen, and leave the other queries' rows intact.
#
# Runs a 2-query bench at sf0.001 with one query deliberately broken via
# SPARK_GRAFT_BENCH_BREAK, then asserts the artifact shape.
set -euo pipefail
cd "$(dirname "$0")/.."

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
SPARK_GRAFT_CPUS=8 \
SPARK_GRAFT_BENCH_ONLY=q1_pricing_agg,q8_sort_limit \
SPARK_GRAFT_BENCH_BREAK=q8_sort_limit \
sbt -batch "runMain graft.Bench" >/dev/null

python3 - <<'EOF'
import json
d = json.load(open("target/bench.json"))
assert d["errored"] == ["q8_sort_limit"], d["errored"]
assert "injected failure" in d["errors"]["q8_sort_limit"], d["errors"]
assert "q8_sort_limit" not in d["queries"], "broken query leaked a timing"
assert "q8_sort_limit" not in d["vs_frozen"], "broken query leaked a ratio"
assert "q1_pricing_agg" in d["queries"] and d["queries"]["q1_pricing_agg"] > 0
assert abs(d["value"] - sum(d["queries"].values())) < 1e-9, \
    "total must be the sum of NON-errored rows only"
print("error-honesty artifact contract: OK")
EOF
