"""Per-stage checkpoint tables + lineage + metrics + mid-run resume
(SURVEY.md §2.1 S7 and §3 EP3).

The reference checkpoints by Java-serializing every document to a
``<docId>.bin`` between phases (main/KbpDocSerializer.scala:29-85) and
"resumes" by re-reading the directory. Ours is the idiomatic-Spark
replacement: each stage writes a columnar table hash-bucketed on
conv_id, a ``lineage`` table records (stage, partition/bucket, run_id,
input fingerprint, row count, wall ms) per completed bucket, and a
resumed run anti-joins its input's buckets against lineage so only
unfinished buckets recompute.

In production these are Iceberg tables (``partitionedBy(bucket(N,
conv_id))``, lineage keyed by snapshot id). This environment has no
Iceberg runtime jar, so the same layout is realized as
parquet-partitioned directories behind one small API — swap
``_write``/``_read`` for ``writeTo(...)``/``read.table`` and nothing
else changes.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "_bucket"


def with_bucket(df: DataFrame, key: str = "conv_id", buckets: int = 32) -> DataFrame:
    """Stable hash-bucket column — the bucket(N, conv_id) partition
    transform. xxhash64 is deterministic across runs and executors."""
    return df.withColumn(BUCKET_COL, F.pmod(F.xxhash64(key), F.lit(buckets)).cast("int"))


class StageStore:
    """A tiny catalog of stage tables rooted at ``root``."""

    def __init__(self, spark: SparkSession, root: str, buckets: int = 32):
        self.spark = spark
        self.root = root
        self.buckets = buckets
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ paths
    def _path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _lineage_path(self) -> str:
        return os.path.join(self.root, "_lineage")

    def _metrics_path(self) -> str:
        return os.path.join(self.root, "_metrics")

    # ------------------------------------------------------------ write
    def write_stage(self, stage: str, df: DataFrame, key: str = "conv_id",
                    run_id: str | None = None, only_buckets: list[int] | None = None) -> str:
        """Write (append) a stage table bucketed on ``key``; record one
        lineage row per bucket written. Returns the run_id."""
        run_id = run_id or uuid.uuid4().hex[:12]
        t0 = time.time()
        b = with_bucket(df, key, self.buckets)
        if only_buckets is not None:
            b = b.where(F.col(BUCKET_COL).isin(only_buckets))
        b.write.mode("append").partitionBy(BUCKET_COL).parquet(self._path(stage))
        wall_ms = int((time.time() - t0) * 1000)

        written = self.spark.read.parquet(self._path(stage))
        counts = (
            written.groupBy(BUCKET_COL)
            .agg(F.count(F.lit(1)).alias("row_count"),
                 # bit_xor: order-independent, never overflows (ANSI-safe)
                 F.expr(f"bit_xor(xxhash64({key}))").alias("fp"))
        )
        if only_buckets is not None:
            counts = counts.where(F.col(BUCKET_COL).isin(only_buckets))
        lineage = counts.select(
            F.lit(stage).alias("stage"),
            F.col(BUCKET_COL).alias("partition_id"),
            F.lit(run_id).alias("run_id"),
            F.conv(F.abs(F.col("fp")).cast("string"), 10, 16).alias("input_fingerprint"),
            F.col("row_count").cast("long"),
            F.lit(wall_ms).cast("long").alias("wall_ms"),
        )
        lineage.write.mode("append").parquet(self._lineage_path())
        return run_id

    def record_metric(self, run_id: str, stage: str, metric: str, value: float) -> None:
        self.spark.createDataFrame(
            [(run_id, stage, metric, float(value), time.time())],
            "run_id string, stage string, metric string, value double, ts double",
        ).write.mode("append").parquet(self._metrics_path())

    # ------------------------------------------------------------- read
    def read_stage(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage)).drop(BUCKET_COL)

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(self._lineage_path())

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(self._metrics_path())

    def done_buckets(self, stage: str) -> list[int]:
        if not os.path.exists(self._lineage_path()):
            return []
        rows = (
            self.lineage().where(F.col("stage") == stage)
            .select("partition_id").distinct().collect()
        )
        return sorted(r.partition_id for r in rows)

    # ----------------------------------------------------------- resume
    def run_resumable(self, stage: str, input_df: DataFrame, fn,
                      key: str = "conv_id", run_id: str | None = None) -> DataFrame:
        """Compute ``fn(input)`` only for buckets lineage has not recorded
        for ``stage`` (resume = anti-join of partitions against lineage,
        SURVEY.md §3 EP3), append results, return the full stage table."""
        done = self.done_buckets(stage)
        src = with_bucket(input_df, key, self.buckets)
        if done:
            src = src.where(~F.col(BUCKET_COL).isin(done))
        todo = src.drop(BUCKET_COL)
        if todo.isEmpty():
            return self.read_stage(stage)
        out = fn(todo)
        remaining = [b for b in range(self.buckets) if b not in set(done)]
        self.write_stage(stage, out, key=key, run_id=run_id, only_buckets=remaining)
        return self.read_stage(stage)
