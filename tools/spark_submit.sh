#!/usr/bin/env bash
# Production-shaped launch (north rule: "run via spark-submit --py-files
# on a multi-executor cluster"). Packages the library as a zip and submits
# the bench job; on a real cluster swap --master local[N] for the cluster
# master and size --num-executors/--executor-cores there.
set -euo pipefail
cd "$(dirname "$0")/.."

CPUS="${SPARK_GRAFT_CPUS:-32}"
ZIP=/tmp/docopenie_spark.zip
rm -f "$ZIP"
python - <<'EOF'
import zipfile, os
with zipfile.ZipFile("/tmp/docopenie_spark.zip", "w") as z:
    for root, _dirs, files in os.walk("docopenie_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("packaged /tmp/docopenie_spark.zip")
EOF

exec spark-submit \
  --master "local[${CPUS}]" \
  --conf spark.sql.shuffle.partitions="${CPUS}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.coalescePartitions.minPartitionSize=64k \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  bench.py
