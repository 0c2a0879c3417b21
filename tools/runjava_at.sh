#!/bin/bash
# runjava against an ARBITRARY classes dir (A/B harness):
#   tools/runjava_at.sh <classesDir> <MainClass> [args...]
# Build the other arm in a worktree under target/ (git worktree add
# target/<name> <ref>; sbt compile there), then interleave legs:
#   tools/runjava_at.sh target/<name>/target/scala-2.13/classes graft.Bench ...
CLASSES="$1"; shift
MAIN="$1"; shift
exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-48g} \
  -cp "$CLASSES:/opt/spark/jars/*" \
  "$MAIN" "$@"
