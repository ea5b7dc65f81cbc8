#!/usr/bin/env bash
# North-rule deployment shape: the packaged engine submitted via spark-submit
# at two cluster sizes (real executor JVMs through local-cluster in this
# sandbox; swap --master for a real cluster URL in production).
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch package
JAR=target/scala-2.13/corpusaidspark_2.13-0.1.0.jar
for EXECS in 1 4; do
  GRAFT_CORES_PER_EXEC=4 SPARK_SCALA_VERSION=2.13 \
  /opt/spark/bin/spark-submit \
    --master "local-cluster[$EXECS,4,8192]" \
    --conf spark.executor.memory=7g \
    --conf spark.ui.enabled=false \
    --conf spark.driver.host=localhost \
    --class graft.Scaling "$JAR" "$EXECS" 200000 5
done
