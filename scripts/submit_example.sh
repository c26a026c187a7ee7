#!/usr/bin/env bash
# Cluster deployment per the north rule: spark-submit --py-files with the
# packaged library zip. On a real cluster swap --master for YARN/K8s and
# size executors; the library itself needs no code changes (get_spark()
# reads SPARK_MASTER, and every operator is partition-count agnostic —
# estimates are parallelism-independent by the merge law).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
PKG_ZIP=$(python -c "import sys; sys.path.insert(0, '$REPO');
from hyperloglog_spark.engine.session import package_zip; print(package_zip())")

spark-submit \
  --master "${SPARK_MASTER:-local[8]}" \
  --py-files "$PKG_ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-64}" \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=131072 \
  "$REPO/scripts/job_distinct_convs.py" "$@"
