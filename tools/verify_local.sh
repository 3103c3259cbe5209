#!/bin/bash
# Run graft.Verify from compiled classes (fast; no sbt startup) and then
# the DuckDB oracle compare. Usage: tools/verify_local.sh [sfdir] [outdir]
set -e
cd "$(dirname "$0")/.."
SFDIR="${1:-/root/testdata/sf0.01}"
OUTDIR="${2:-/tmp/verify_out}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
rm -rf "$OUTDIR"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SFDIR" "$OUTDIR" 2>/tmp/verify_stderr.log \
  || { tail -30 /tmp/verify_stderr.log; exit 1; }
grep -E "^\[verify\]" /tmp/verify_stderr.log || true
python3 tools/check.py "$SFDIR" "$OUTDIR" "${3:-}"
