#!/bin/bash
# Run graft.Bench (or another main via MAIN=) without sbt: frees the
# sbt project lock for compile/test while long benches run, and skips
# ~20 s of sbt startup per invocation. Compile first (sbt -batch
# compile); this only launches what's already in target/.
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "${GRAFT_CLASSES:-target/scala-2.13/classes}:/opt/spark/jars/*" \
  "${MAIN:-graft.Bench}" "$@"
