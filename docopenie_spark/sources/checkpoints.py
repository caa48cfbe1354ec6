"""Per-stage checkpoint tables + lineage + metrics + mid-run resume
(SURVEY.md §2.1 S7 and §3 EP3).

The reference checkpoints by Java-serializing every document to a
``<docId>.bin`` between phases (main/KbpDocSerializer.scala:29-85) and
"resumes" by re-reading the directory; each ``.bin`` is overwrite-
idempotent. Ours is the idiomatic-Spark replacement with the same
idempotency guarantee at bucket granularity:

- each stage writes a columnar table hash-bucketed on conv_id using
  DYNAMIC PARTITION OVERWRITE — re-writing a bucket REPLACES it, so a
  run killed between the data write and the lineage write leaves buckets
  that the resume simply overwrites (never appends → no duplicates);
- a ``lineage`` table records (stage, bucket, run_id, input fingerprint,
  row count, wall ms) for EVERY ATTEMPTED bucket — including buckets
  whose output is legitimately empty (row_count 0), so resume's all-done
  short-circuit fires even for empty buckets;
- lineage is computed from the buckets just written (partition-pruned,
  column-pruned read of the key column only — O(written buckets), never
  a full-table rescan) and the input fingerprint from the batch's INPUT;
- ``read_stage`` exposes only lineage-committed buckets, so data whose
  lineage write never landed is invisible until the resume replaces it.

In production these are Iceberg tables (``partitionedBy(bucket(N,
conv_id))``, lineage keyed by snapshot id). This environment has no
Iceberg runtime jar, so the same layout is realized as
parquet-partitioned directories behind one small API — swap
``_write``/``_read`` for ``writeTo(...)``/``read.table`` and nothing
else changes.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time
import uuid
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

BUCKET_COL = "_bucket"


def schema_fingerprint(schema: StructType) -> str:
    """Stable fingerprint of a stage's DATA schema (bucket column
    excluded). Recorded in lineage at write time; resume treats a
    mismatch against the CURRENT code's expected output schema as
    not-done, forcing recompute — otherwise a checkpoint directory
    written by pre-change code is silently read back with missing/
    renamed columns (e.g. the round-3 ANNOTATED e_len change)."""
    ddl = ",".join(
        f"{f.name}:{f.dataType.simpleString()}:{f.nullable}"
        for f in schema.fields if f.name != BUCKET_COL
    )
    return hashlib.md5(ddl.encode()).hexdigest()[:16]


def with_bucket(df: DataFrame, key: str = "conv_id", buckets: int = 32) -> DataFrame:
    """Stable hash-bucket column — the bucket(N, conv_id) partition
    transform. xxhash64 is deterministic across runs and executors."""
    return df.withColumn(BUCKET_COL, F.pmod(F.xxhash64(key), F.lit(buckets)).cast("int"))


def _bucket_stats(df_with_bucket: DataFrame, key: str) -> dict[int, tuple[int, str]]:
    """{bucket: (row_count, fingerprint_hex)} — one column-pruned agg.
    bit_xor of xxhash64(key) is order-independent and never overflows."""
    rows = (
        df_with_bucket.groupBy(BUCKET_COL)
        .agg(F.count(F.lit(1)).alias("n"),
             F.expr(f"bit_xor(xxhash64({key}))").alias("fp"))
        .collect()
    )
    return {
        int(r[BUCKET_COL]): (int(r["n"]), format(r["fp"] & 0xFFFFFFFFFFFFFFFF, "x"))
        for r in rows
    }


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
                    run_id: str | None = None, only_buckets: list[int] | None = None,
                    input_fps: dict[int, str] | None = None) -> str:
        """Write a stage table bucketed on ``key`` with dynamic partition
        overwrite (idempotent per bucket); record one lineage row per
        ATTEMPTED bucket (``only_buckets`` if given, else all) — buckets
        that produced no rows get row_count 0, so resume never retries
        them. ``input_fps`` carries the per-bucket INPUT fingerprints
        (run_resumable computes them); without it the fingerprint of the
        written output is recorded. Returns the run_id."""
        from pyspark import StorageLevel

        run_id = run_id or uuid.uuid4().hex[:12]
        attempted = sorted(only_buckets) if only_buckets is not None else list(range(self.buckets))
        t0 = time.time()
        b = with_bucket(df, key, self.buckets)
        if only_buckets is not None:
            b = b.where(F.col(BUCKET_COL).isin(attempted))
        # persist so stats and the write share ONE computation of the
        # output; stats MUST come from the output itself, never from a
        # read-back of the directory — a read-back would conflate fresh
        # rows with stale data left by a previous killed run in attempted
        # buckets whose recomputed output is empty (dynamic overwrite only
        # replaces partitions PRESENT in the output).
        b = b.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            stats = _bucket_stats(b, key)
            (
                b.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(BUCKET_COL)
                .parquet(self._path(stage))
            )
            # clear attempted buckets absent from the output, so a lineage
            # row_count of 0 always corresponds to an actually-empty bucket
            # (Iceberg's overwritePartitions over an explicit bucket
            # predicate does this natively; parquet dirs need the rm).
            # The clear must not silently no-op: a swallowed failure here
            # resurrects stale rows from a previous killed run.
            stale = [bk for bk in attempted if bk not in stats]
            if stale and "://" in self.root and not self.root.startswith("file:"):
                raise NotImplementedError(
                    f"stale-bucket clear needs a local stage root, got {self.root!r};"
                    " non-local roots take the Iceberg overwritePartitions path"
                    " (see module docstring)"
                )
            for bk in stale:
                try:
                    shutil.rmtree(os.path.join(self._path(stage), f"{BUCKET_COL}={bk}"))
                except FileNotFoundError:
                    pass  # bucket never existed — nothing stale to clear
        finally:
            b.unpersist()
        wall_ms = int((time.time() - t0) * 1000)
        sfp = schema_fingerprint(df.schema)
        rows = []
        for bk in attempted:
            n, out_fp = stats.get(bk, (0, "0"))
            fp = (input_fps or {}).get(bk, out_fp)
            rows.append((stage, bk, run_id, fp, n, wall_ms, sfp))
        self.spark.createDataFrame(
            rows,
            "stage string, partition_id int, run_id string, "
            "input_fingerprint string, row_count long, wall_ms long, "
            "schema_fp string",
        ).coalesce(1).write.mode("append").parquet(self._lineage_path())
        return run_id

    def record_metric(self, run_id: str, stage: str, metric: str, value: float) -> None:
        self.spark.createDataFrame(
            [(run_id, stage, metric, float(value), time.time())],
            "run_id string, stage string, metric string, value double, ts double",
        ).write.mode("append").parquet(self._metrics_path())

    # ------------------------------------------------------------- read
    def read_stage(self, stage: str, committed_only: bool = True,
                   schema_fp: str | None = None,
                   trust_legacy: bool = True) -> DataFrame:
        """The stage table, restricted to lineage-committed buckets:
        data whose lineage write never landed (a kill between the two
        writes) stays invisible until resume overwrites it — including
        when NO lineage write ever landed (zero committed buckets means
        zero visible rows, not everything). ``schema_fp`` additionally
        hides buckets committed under a DIFFERENT output schema."""
        df = self.spark.read.parquet(self._path(stage))
        if committed_only:
            done = self.done_buckets(stage, schema_fp=schema_fp,
                                     trust_legacy=trust_legacy)
            df = df.where(F.col(BUCKET_COL).isin(done) if done else F.lit(False))
        return df.drop(BUCKET_COL)

    def lineage(self) -> DataFrame:
        # mergeSchema: lineage directories written before a column was
        # added (e.g. schema_fp) stay readable, with nulls for the gap
        return self.spark.read.option("mergeSchema", "true").parquet(self._lineage_path())

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(self._metrics_path())

    def done_buckets(self, stage: str, schema_fp: str | None = None,
                     trust_legacy: bool = True) -> list[int]:
        """Buckets with a lineage row for ``stage``. With ``schema_fp``,
        only rows whose recorded output schema matches count — a stale-
        schema checkpoint is "not done" and gets recomputed. Legacy rows
        with no recorded fingerprint can't be verified: by default they
        keep their pre-guard behavior of counting as done, but LOUDLY —
        a warning names the stage and bucket count, so a pre-guard
        checkpoint is visibly trusted, never silently accepted (ADVICE
        r4: the silent path was the exact stale-column hazard the guard
        targets). ``trust_legacy=False`` treats them as not-done
        instead (recompute)."""
        if not os.path.exists(self._lineage_path()):
            return []
        lin = self.lineage().where(F.col("stage") == stage)
        if schema_fp is not None and "schema_fp" in lin.columns:
            n_legacy = lin.where(F.col("schema_fp").isNull()).count()
            if n_legacy and trust_legacy:
                warnings.warn(
                    f"checkpoint stage {stage!r}: {n_legacy} lineage rows "
                    "predate the schema guard (no recorded fingerprint) and "
                    "are trusted as-is; pass trust_legacy=False to recompute "
                    "them under the current schema",
                    stacklevel=2,
                )
            fp_ok = F.col("schema_fp") == schema_fp
            if trust_legacy:
                fp_ok = F.col("schema_fp").isNull() | fp_ok
            lin = lin.where(fp_ok)
        rows = lin.select("partition_id").distinct().collect()
        return sorted(r.partition_id for r in rows)

    # ----------------------------------------------------------- resume
    def run_resumable(self, stage: str, input_df: DataFrame, fn,
                      key: str = "conv_id", run_id: str | None = None,
                      trust_legacy: bool = True) -> DataFrame:
        """Compute ``fn(input)`` only for buckets lineage has not recorded
        for ``stage`` (resume = anti-join of partitions against lineage,
        SURVEY.md §3 EP3), overwrite those buckets, return the full stage
        table. Every remaining bucket gets a lineage row (row_count 0 for
        empty ones), so the next resume short-circuits without reading
        the input at all.

        Buckets committed under a different OUTPUT schema than the
        current ``fn`` produces count as not-done (schema guard): the
        expected schema comes from applying ``fn`` to an empty slice of
        the input — plan analysis only, nothing executes."""
        expected_fp = schema_fingerprint(fn(input_df.limit(0)).schema)
        done = set(self.done_buckets(stage, schema_fp=expected_fp,
                                     trust_legacy=trust_legacy))
        remaining = [b for b in range(self.buckets) if b not in done]
        if not remaining:
            return self.read_stage(stage, schema_fp=expected_fp,
                                   trust_legacy=trust_legacy)
        src = with_bucket(input_df, key, self.buckets)
        if done:
            src = src.where(~F.col(BUCKET_COL).isin(sorted(done)))
        input_fps = {
            bk: f"{n:x}:{fp}" for bk, (n, fp) in _bucket_stats(src, key).items()
        }
        out = fn(src.drop(BUCKET_COL))
        self.write_stage(stage, out, key=key, run_id=run_id,
                         only_buckets=remaining, input_fps=input_fps)
        return self.read_stage(stage, schema_fp=expected_fp,
                               trust_legacy=trust_legacy)
