#!/bin/bash
# Run a graft main class directly (outside sbt) with the same JVM flags
# build.sbt sets for forked runs. Usage: runjava.sh <mainClass> [args...]
# Repo root is derived from this script's location and test-dep versions
# are globbed, so a version bump or a different checkout path fails fast
# with a clear message instead of a confusing NoClassDefFoundError.
set -u
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
CLASSES="$ROOT/target/scala-2.13/classes"
[ -d "$CLASSES" ] || { echo "runjava.sh: $CLASSES missing - run 'sbt compile' first" >&2; exit 1; }
CP="$CLASSES:$ROOT/target/scala-2.13/test-classes"
TESTJARS=$(find "${COURSIER_CACHE:-$HOME/.cache/coursier}" \
  \( -name 'scalatest*_2.13-*.jar' -o -name 'scalatest-compatible-*.jar' \
     -o -name 'scalactic_2.13-*.jar' -o -name 'scalacheck_2.13-*.jar' \) 2>/dev/null)
# test jars are only needed for Test/ mains; warn, don't fail, for main-tree runs
[ -n "$TESTJARS" ] || echo "runjava.sh: no scalatest/scalacheck jars under coursier cache - Test mains will not load" >&2
for j in $TESTJARS; do CP="$CP:$j"; done
[ -e /opt/spark/jars ] || { echo "runjava.sh: /opt/spark/jars missing" >&2; exit 1; }
CP="$CP:/opt/spark/jars/*"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic; do ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"; done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"; done
exec java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx${SPARK_DRIVER_MEM:-8g} -cp "$CP" "$@"
