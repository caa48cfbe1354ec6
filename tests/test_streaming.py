"""availableNow incremental ingest: exactly-once, resume picks up only
new files."""

from docopenie_spark import datagen
from docopenie_spark.streaming.incremental import ingest_available_now, read_ingested


def test_available_now_exactly_once(spark, tmp_path):
    inp = str(tmp_path / "in")
    tbl = str(tmp_path / "tbl")
    cp = str(tmp_path / "cp")

    t1 = datagen.transcripts_df(spark, 80)
    t1.write.mode("append").parquet(inp)
    ingest_available_now(spark, inp, tbl, cp, buckets=4)
    assert read_ingested(spark, tbl).count() == 80

    # re-run with no new data → no duplicates
    ingest_available_now(spark, inp, tbl, cp, buckets=4)
    assert read_ingested(spark, tbl).count() == 80

    # new file arrives → only the delta is appended
    datagen.transcripts_df(spark, 40, seed=7).write.mode("append").parquet(inp)
    ingest_available_now(spark, inp, tbl, cp, buckets=4)
    assert read_ingested(spark, tbl).count() == 120


def test_stateful_streaming_extract_matches_batch(spark, tmp_path):
    """applyInPandasWithState incremental extraction: turns arriving over
    two micro-batches WITH an out-of-order gap must emit exactly the
    batch pipeline's raw triples (same offsets — the state carries the
    running document offset and buffers the gap until it fills)."""
    import pyspark.sql.functions as F

    from docopenie_spark import schemas
    from docopenie_spark.operators import assembly, fused
    from docopenie_spark.plans.pipeline import default_dictionaries
    from docopenie_spark.streaming.incremental import streaming_extract

    inp = str(tmp_path / "sin")
    out = str(tmp_path / "sout")
    cp = str(tmp_path / "scp")

    t = datagen.transcripts_df(spark, 80).cache()
    # batch 1: every conversation's turns EXCEPT turn 2 (a gap)
    t.where(F.col("turn_idx") != 2).write.mode("append").parquet(inp)
    streaming_extract(spark, inp, out, cp)
    first = spark.read.parquet(out)
    # nothing beyond the gap may be emitted yet
    assert first.where(F.col("turn_idx") > 2).isEmpty()

    # batch 2: the missing turn arrives → the buffered tail drains
    t.where(F.col("turn_idx") == 2).write.mode("append").parquet(inp)
    streaming_extract(spark, inp, out, cp)
    got = spark.read.parquet(out).select(
        "conv_id", "turn_idx", "sent_num",
        "arg1_text", "arg1_offset", "rel_text", "rel_offset",
        "arg2_text", "arg2_offset", "confidence", "extractor",
    )

    fn, gz, ln = default_dictionaries()
    batch = fused.split_triples(
        fused.parse_extract_annotate(assembly.with_turn_offsets(t), fn, gz, ln)
    ).select(
        "conv_id", "turn_idx", "sent_num",
        F.col("arg1.text").alias("arg1_text"), F.col("arg1.offset").alias("arg1_offset"),
        F.col("rel.text").alias("rel_text"), F.col("rel.offset").alias("rel_offset"),
        F.col("arg2.text").alias("arg2_text"), F.col("arg2.offset").alias("arg2_offset"),
        "confidence", "extractor",
    )
    assert got.exceptAll(batch).isEmpty(), "streaming ⊄ batch"
    assert batch.exceptAll(got).isEmpty(), "batch ⊄ streaming"
    assert got.count() == batch.count() > 0
