#!/bin/bash
# Run a graft main class directly (outside sbt) with the same JVM flags
# build.sbt sets for forked runs. Usage: runjava.sh <mainClass> [args...]
CP="/root/repo/target/scala-2.13/classes:/root/repo/target/scala-2.13/test-classes"
for j in $(find /root/.cache/coursier -name 'scalatest*_2.13-3.2.19.jar' -o -name 'scalatest-compatible-3.2.19.jar' -o -name 'scalactic_2.13-3.2.19.jar' -o -name 'scalacheck_2.13-1.18.0.jar' 2>/dev/null); do CP="$CP:$j"; done
CP="$CP:/opt/spark/jars/*"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic; do ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"; done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"; done
exec java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx${SPARK_DRIVER_MEM:-8g} -cp "$CP" "$@"
