#!/bin/bash
# Run graft.Bench from compiled classes (no sbt startup, no log prefixes)
# so the artifact line starts with `{` and is bare-JSON parseable.
# Usage: tools/bench_local.sh [sfdir]
#   env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_REPEAT (default 1),
#        SPARK_GRAFT_QUERIES (comma filter)
set -e
cd "$(dirname "$0")/.."
SFDIR="${1:-${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench 2>/tmp/bench_stderr.log \
  || { tail -30 /tmp/bench_stderr.log; exit 1; }
