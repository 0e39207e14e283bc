#!/bin/bash
# Run a graft main class directly (no sbt — frees the sbt project lock
# for parallel compile/test while long benchmarks run). Usage:
#   tools/run_main.sh <classpath> <MainClass> [args...]
# Env passes through (SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE_PARTITIONS...).
set -e
CP="$1"; shift
MAIN="$1"; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-48g} -XX:+UseG1GC \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP:/opt/spark/jars/*" "$MAIN" "$@"
