#!/bin/bash
# sf1 correctness gate: the round-7 decimal work was motivated by sf1
# hash drift — this proves the whole 198-query surface CELL-EXACT at 10x
# the largest driver SF, not just benchable. Builds the ScaleUp corpus
# once (cached), runs graft.Verify over it, then the DuckDB compare with
# a CORRECTNESS-style JSON artifact.
#
# Usage: tools/verify_sf1.sh [sf1dir] [outdir] [artifact]
set -e
cd "$(dirname "$0")/.."
SF1DIR="${1:-/tmp/graft_sf1}"
OUTDIR="${2:-/tmp/verify_sf1}"
ARTIFACT="${3:-CORRECTNESS_sf1.json}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
if [ ! -d "$SF1DIR/lineitem.parquet" ] && [ ! -f "$SF1DIR/lineitem.parquet" ]; then
  echo "[verify_sf1] building sf1 corpus at $SF1DIR (ScaleUp x10 of sf0.1)"
  java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx12g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.tools.ScaleUp /root/testdata/sf0.1 "$SF1DIR" 10
fi
rm -rf "$OUTDIR"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF1DIR" "$OUTDIR" 2>/tmp/verify_sf1_stderr.log \
  || { tail -30 /tmp/verify_sf1_stderr.log; exit 1; }
grep -E "^\[verify\]" /tmp/verify_sf1_stderr.log || true
CHECK_JSON_OUT="$ARTIFACT" python3 tools/check.py "$SF1DIR" "$OUTDIR"
