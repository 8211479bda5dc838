#!/bin/bash
# Full-registry sf0.1 correctness sweep in sequential batches (r13+
# cadence: the heavy pair-replay oracles are cheap enough that the whole
# registry fits in ~1.5-2h).  One tools/check.py process per batch keeps
# Spark session lifetime bounded and failures attributable.
set -u
SF_DIR="${1:-/root/testdata/sf0.1}"
BATCH="${2:-45}"
cd "$(dirname "$0")/.."
names=$(python - <<'EOF'
import __spark_entry__ as m
print(" ".join(m.queries().keys()))
EOF
)
set -- $names
total=$#
echo "sweep: $total rows at $SF_DIR, batch=$BATCH"
i=0
while [ $# -gt 0 ]; do
    chunk=""
    n=0
    while [ $# -gt 0 ] && [ $n -lt "$BATCH" ]; do
        chunk="$chunk $1"; shift; n=$((n+1))
    done
    i=$((i+1))
    echo "=== batch $i ($n rows) ==="
    timeout 3000 python tools/check.py "$SF_DIR" $chunk 2>&1 \
        | grep -aE "^ok |^FAIL|^weak|ok=" || echo "batch $i: check.py FAILED"
done
