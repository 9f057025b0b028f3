#!/usr/bin/env bash
# Package the engine and run the KG-construction job via spark-submit
# --py-files (the north-rule deployment shape). Usage:
#   scripts_dev/run_spark_submit.sh [events_sf_dir] [threads]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.01}"
THREADS="${2:-32}"
ZIP=/tmp/owl_n4j_spark.zip
WH=/tmp/owl_submit_wh_$$

rm -f "$ZIP"
zip -qr "$ZIP" owl_n4j_spark -x '*__pycache__*'

spark-submit \
  --master "local[$THREADS]" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="$THREADS" \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$ZIP" \
  scripts/kg_construct_job.py \
  --events "$SF_DIR" --warehouse "$WH" 2>&1 | grep "KG_CONSTRUCT_RESULT"

rm -rf "$WH"
