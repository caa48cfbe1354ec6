"""Checkpoint/lineage/resume (S7 analogue): resumed run ≡ fresh run."""

import pyspark.sql.functions as F

from docopenie_spark import datagen
from docopenie_spark.sources.checkpoints import StageStore, with_bucket


def test_write_read_roundtrip(spark, tmp_path):
    store = StageStore(spark, str(tmp_path / "cp"), buckets=8)
    t = datagen.transcripts_df(spark, 160)
    store.write_stage("transcripts", t)
    back = store.read_stage("transcripts")
    assert back.count() == 160
    assert set(back.columns) == set(t.columns)


def test_lineage_rows_per_bucket(spark, tmp_path):
    store = StageStore(spark, str(tmp_path / "cp"), buckets=8)
    t = datagen.transcripts_df(spark, 160)
    store.write_stage("s1", t, run_id="runA")
    lin = store.lineage().where(F.col("stage") == "s1").collect()
    assert {r.run_id for r in lin} == {"runA"}
    assert sum(r.row_count for r in lin) == 160
    assert all(r.wall_ms >= 0 for r in lin)


def test_resume_equals_fresh_run(spark, tmp_path):
    """Kill-mid-run simulation: write only half the buckets, then resume —
    the union must equal a fresh full run exactly."""
    t = datagen.transcripts_df(spark, 240)

    def fn(df):
        return df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))

    fresh = fn(t)

    store = StageStore(spark, str(tmp_path / "cp"), buckets=8)
    # simulate a run killed after buckets 0-3
    partial = fn(t)
    store.write_stage("agg", partial, key="conv_id", run_id="run1",
                      only_buckets=[0, 1, 2, 3])
    done_before = store.done_buckets("agg")
    assert 0 < len(done_before) < 8

    resumed = store.run_resumable("agg", t, fn, key="conv_id", run_id="run2")
    assert resumed.exceptAll(fresh).isEmpty()
    assert fresh.exceptAll(resumed).isEmpty()

    # second resume is a no-op (everything recorded)
    again = store.run_resumable("agg", t, fn, key="conv_id", run_id="run3")
    assert again.count() == fresh.count()
    runs = {r.run_id for r in store.lineage().collect()}
    assert "run3" not in runs  # nothing recomputed


def test_bucket_is_deterministic(spark):
    t = datagen.transcripts_df(spark, 80)
    a = with_bucket(t).select("conv_id", "_bucket").distinct()
    b = with_bucket(t).select("conv_id", "_bucket").distinct()
    assert a.exceptAll(b).isEmpty()
    # one bucket per conv_id
    multi = a.groupBy("conv_id").count().where(F.col("count") > 1)
    assert multi.isEmpty()
