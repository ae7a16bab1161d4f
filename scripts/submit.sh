#!/usr/bin/env bash
# Cluster launch (north_rule: spark-submit --py-files, multi-executor).
#
# Usage: scripts/submit.sh <corpus_location> <checkpoint_dir> \
#            [app args: mode tau | --append <batch_location>]
# Extra spark-submit flags (master, executor sizing) go in $SUBMIT_FLAGS.
#
# Packages the engine as a zip and submits the dedup job. On a real
# cluster pass --master yarn/k8s and executor sizing; shuffle
# partitions should be ~2-3x total executor cores at 100 TB scale
# (AQE coalesces the excess).
set -euo pipefail

REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
CORPUS="${1:?corpus location (Iceberg table or parquet path)}"
CKPT="${2:?checkpoint dir}"
shift 2

ZIP="$(mktemp -d)/deduplidog_spark.zip"
(cd "$REPO_DIR" && zip -qr "$ZIP" deduplidog_spark)

exec spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.adaptive.advisoryPartitionSizeInBytes=8m \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  ${SUBMIT_FLAGS:-} \
  "$REPO_DIR/scripts/run_dedupe.py" "$CORPUS" "$CKPT" "$@"
