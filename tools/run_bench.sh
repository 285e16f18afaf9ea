#!/bin/bash
# Launch graft.Bench directly with java (no sbt overhead) so load_start
# measures the box, not the build tool. Usage: run_bench.sh [sfdir] [reps] [outfile]
set -e
# resources dir carries META-INF/services (DSv2 DataSourceRegister for
# graft-range/graft-sink); `sbt compile` alone does not copy it into
# classes, so put it on the CP explicitly
CP="/root/repo/target/scala-2.13/classes:/root/repo/src/main/resources:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# idle gate: the r6/r7 BENCH artifacts were taken on loaded boxes and
# unusable for round-over-round deltas; refuse to start until the 1-min
# load has decayed below 0.4 (or 15 min pass, then proceed loudly)
for i in $(seq 1 90); do
  L=$(cut -d' ' -f1 /proc/loadavg)
  awk -v l="$L" 'BEGIN{exit !(l<0.4)}' && break
  sleep 10
done
echo "load at launch: $(cut -d' ' -f1 /proc/loadavg)" >&2
SPARK_GRAFT_SF_DIR="${1:-/root/testdata/sf0.1}" \
SPARK_GRAFT_BENCH_REPS="${2:-3}" \
SPARK_GRAFT_BENCH_FILE="${3:-/root/repo/BENCH_LAST.json}" \
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-8g} -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench
