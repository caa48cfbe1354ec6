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
