#!/bin/bash
# spark-submit --py-files deployment demo: package the engine as a zip and
# submit the flagship tiling job with it (BASELINE.json's launch shape).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/oqt_spark_pkg.zip
( cd "$REPO" && rm -f "$ZIP" && zip -qr "$ZIP" osmquadtree_rust_spark -x '*__pycache__*' )
exec spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-8}" \
  --py-files "$ZIP" \
  "$REPO/tools/submit_pipeline.py" "${1:-100000}" "${2:-/tmp/oqt_submit_demo}"
