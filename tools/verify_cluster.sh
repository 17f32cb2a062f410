#!/bin/bash
# Distributed-execution rehearsal (round-9 verdict item 3): run the full
# Verify suite on local-cluster[2,8,4096] — REAL forked executor JVMs, so
# kernel codegen references, task lambdas, Aggregators and the AsofJoin
# SparkPlan all cross a serialization boundary (single-JVM local[N] can
# never exercise this; the first run caught 54 failures: executor
# classpath missing the application classes).
#
# Must launch with plain `java -cp` (sbt's launcher classpath doesn't
# propagate to executor commands). Usage:
#   sbt -batch compile && bash tools/verify_cluster.sh [sfDir] [outDir]
set -e
SF="${1:-/root/testdata/sf0.001}"
OUT="${2:-/tmp/vdist}"
CP="/opt/spark/jars/*:target/scala-2.13/classes"
OPENS=""
for o in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$o=ALL-UNNAMED"
done
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' SPARK_GRAFT_CPUS=16 \
java $OPENS -Xmx8g -XX:ReservedCodeCacheSize=1g \
  -Dspark.ui.enabled=false -cp "$CP" graft.Verify "$SF" "$OUT"
python3 tools/check.py "$SF" "$OUT"
