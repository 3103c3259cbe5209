#!/bin/bash
# Run ScalaTest suites from compiled classes (no sbt startup/lock).
# Usage: tools/test_local.sh graft.PgWireSpec [-- -z "substring"]
set -e
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:target/scala-2.13/test-classes:/opt/spark/jars/*"
for j in $(find /root/.cache/coursier -name "scalatest*_2.13-3.2.19.jar" -o -name "scalatest-compatible-3.2.19.jar" -o -name "scalactic_2.13-3.2.19.jar" -o -name "scala-xml_2.13*.jar" -o -name "scalacheck_2.13*.jar" 2>/dev/null); do
  CP="$CP:$j"
done
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SUITE="$1"; shift || true
java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g \
  -cp "$CP" org.scalatest.tools.Runner -oW -s "$SUITE" "$@"
