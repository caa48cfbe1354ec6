"""Incremental ingest (SURVEY.md §2.9).

The reference is strictly batch; the north rule requires batch too. This
module is the optional incremental-ingest mode the checkpoint/lineage
design enables for free: new transcript files land in a directory, a
``trigger(availableNow=True)`` Structured Streaming pass drains whatever
arrived since the last checkpoint, runs the NARROW part of the pipeline
(assembly-scoped stages need the full conversation, so streaming covers
the turn-scoped spine: normalize → segment → tokenize → extract on
per-turn offsets is not possible without the window — instead we stage
raw turns into the bucketed transcripts table and let the batch pipeline
resume from lineage).

So the streaming job's contract is deliberately small: exactly-once
append of arriving turns into the bucketed ``transcripts`` stage table;
the batch pipeline (plans/pipeline.py + sources/checkpoints.py) picks up
from there. That split mirrors production KG builds: streaming handles
ingest/dedup, batch handles conversation-scoped semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..sources.checkpoints import BUCKET_COL, with_bucket


def ingest_available_now(
    spark: SparkSession,
    input_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    buckets: int = 32,
) -> None:
    """Drain all currently-available parquet files from ``input_dir`` into
    the bucketed transcripts table at ``table_dir``, exactly once (state
    in ``checkpoint_dir``), then stop. Re-running picks up only new files.
    """
    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .parquet(input_dir)
    )
    bucketed = with_bucket(stream, "conv_id", buckets)
    q = (
        bucketed.writeStream.format("parquet")
        .option("path", table_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy(BUCKET_COL)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_ingested(spark: SparkSession, table_dir: str):
    return spark.read.parquet(table_dir).drop(BUCKET_COL)
