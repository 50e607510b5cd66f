#!/usr/bin/env bash
# Direct-JVM launcher for graft mains (Bench/Verify) — bypasses sbt so a
# long benchmark doesn't hold the sbt lock (and adds zero sbt overhead).
# Mirrors build.sbt's javaOptions; compile first with `sbt compile`.
#   tools/bench.sh graft.Bench [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
ADD_OPENS=(java.lang java.lang.invoke java.lang.reflect java.io java.net \
  java.nio java.util java.util.concurrent java.util.concurrent.atomic)
FLAGS=()
for p in "${ADD_OPENS[@]}"; do FLAGS+=(--add-opens "java.base/$p=ALL-UNNAMED"); done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  FLAGS+=(--add-opens "java.base/$p=ALL-UNNAMED"); done
exec java "${FLAGS[@]}" \
  --add-modules jdk.incubator.vector \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -XX:ReservedCodeCacheSize=512m \
  -XX:+UseCodeCacheFlushing \
  -XX:+ClassUnloadingWithConcurrentMark \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
