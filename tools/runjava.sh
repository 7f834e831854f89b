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
# Newline-safe iteration (advice r14: the unquoted $TESTJARS loop
# word-split on any path containing spaces), and ONE jar per ARTIFACT —
# the newest by version sort — so two cached scalatest versions can't
# land on the classpath together and resolve nondeterministically.
# (scalatest is modular: core/funsuite/... are distinct artifacts, each
# keeps its own newest jar.)
FOUND=0
while IFS= read -r jar; do
  [ -n "$jar" ] || continue
  CP="$CP:$jar"; FOUND=1
done < <(find "${COURSIER_CACHE:-$HOME/.cache/coursier}" \
    \( -name 'scalatest*_2.13-*.jar' -o -name 'scalatest-compatible-*.jar' \
       -o -name 'scalactic_2.13-*.jar' -o -name 'scalacheck_2.13-*.jar' \) \
    -print 2>/dev/null \
  | awk -F/ '{n=$NF; sub(/-[0-9][0-9A-Za-z.+-]*\.jar$/, "", n); print n "\t" $0}' \
  | sort -t "$(printf '\t')" -k1,1 -k2,2V \
  | awk -F '\t' '{last[$1]=$2} END {for (k in last) print last[k]}' \
  | sort)
# the trailing sort makes classpath ORDER byte-stable too (advice r15:
# awk's 'for (k in last)' iteration order is unspecified, so only the
# jar SET was deterministic before)
# test jars are only needed for Test/ mains; warn, don't fail, for main-tree runs
[ "$FOUND" = 1 ] || echo "runjava.sh: no scalatest/scalacheck jars under coursier cache - Test mains will not load" >&2
[ -e /opt/spark/jars ] || { echo "runjava.sh: /opt/spark/jars missing" >&2; exit 1; }
CP="$CP:/opt/spark/jars/*"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic; do ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"; done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"; done
exec java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx${SPARK_DRIVER_MEM:-8g} -cp "$CP" "$@"
