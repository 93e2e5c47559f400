#!/usr/bin/env bash
# spark-submit entry for the correction pipeline (north_rule: "run via
# spark-submit"). Packages the library and submits the requested main against
# a local[N] master here; on a real cluster, swap --master / add executor
# confs — the code paths are identical.
#
#   bin/submit.sh graft.tools.Smoke 2000
#   bin/submit.sh graft.Bench
#   SPARK_GRAFT_CORES=8 bin/submit.sh graft.tools.ResumeDemo
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="${1:-graft.tools.Smoke}"; shift || true
CORES="${SPARK_GRAFT_CORES:-8}"

sbt -batch package > /dev/null
JAR=$(ls target/scala-2.13/*.jar | head -1)

exec /opt/spark/bin/spark-submit \
  --master "local[$CORES]" \
  --name graft-pipeline \
  --conf spark.sql.shuffle.partitions="$CORES" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  --class "$MAIN" \
  "$JAR" "$@"
