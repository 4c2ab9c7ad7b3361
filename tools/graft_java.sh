#!/usr/bin/env bash
# Launch a graft main class on the compiled classes directly — the same
# JVM contract as build.sbt's forked `run` (add-opens set from Spark's
# JavaModuleOptions, jdk.incubator.vector for vectorized BLAS, UTC, UI
# off, SPARK_DRIVER_MEM heap) without the sbt startup or the project
# lock, so campaign stages can run while sbt compiles/tests elsewhere.
# Usage: tools/graft_java.sh graft.ScaleCorpus <args...>
# Compile first: sbt -batch compile (this script never compiles).
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=target/scala-2.13/classes
[[ -d "$CLASSES" ]] || { echo "run 'sbt -batch compile' first" >&2; exit 1; }
ADD_OPENS=(
  java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio
  java.base/java.util java.base/java.util.concurrent
  java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar
)
OPTS=()
for p in "${ADD_OPENS[@]}"; do OPTS+=(--add-opens "$p=ALL-UNNAMED"); done
exec java "${OPTS[@]}" --add-modules jdk.incubator.vector \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
