#!/bin/bash
# Run any graft main without sbt (frees the shared sbt target lock).
# Replicates build.sbt's forked-run JVM flags; requires a prior
# `sbt compile` (reads target/scala-2.13/classes).
#
# Usage: [SPARK_GRAFT_* envs] tools/runjava.sh graft.Verify <args...>
set -eo pipefail
cd /root/repo
CLASS="$1"; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$CLASS" "$@"
