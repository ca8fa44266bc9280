#!/usr/bin/env bash
# One-command scale gate: generate an sf dataset, dump every
# SparkEntry.queries result, and run the DuckDB-oracle compare there.
#
#   tools/gate_sf.sh 1            # gate at sf1 (data + dumps under /tmp)
#   tools/gate_sf.sh 10 /data     # keep artifacts under /data
#   SKIP_GEN=1 tools/gate_sf.sh 3 # reuse an existing dataset dir
#
# sf30 needs SPARK_DRIVER_MEM=24g (single local JVM sorts a 45M-row
# dump; the 8g default OOMs a read-ahead thread — cluster-irrelevant,
# local[n] heap sizing only).
#
# Exit 0 iff EVERY query matches rows+schema+hash (check_oracle.py's
# contract). This is the same chain the round driver runs at sf0.01 —
# kept one invocation so every round's scale re-verification is cheap.
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:?usage: gate_sf.sh <sf> [workdir]}"
WORK="${2:-/tmp}"
DATA="$WORK/sf$SF"
DUMP="$WORK/verify_sf$SF"

if [[ "${SKIP_GEN:-}" != 1 || ! -d "$DATA" ]]; then
  echo "== generating sf$SF -> $DATA"
  python3 tools/gen_sf.py "$SF" "$DATA"
fi

echo "== dumping query results -> $DUMP"
rm -rf "$DUMP"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  sbt -batch "runMain graft.Verify $DATA $DUMP"

echo "== DuckDB oracle compare"
python3 tools/check_oracle.py "$DATA" "$DUMP"
