"""The join-based best_mentions (resolve once per distinct name, fan out
via JVM join) must match the per-occurrence Python reference on every
field except best_entity.offset, which is pick-order metadata (the
nearest OCCURRENCE of the chosen candidate — the chosen NAME, kind, and
count are identical) and is consumed nowhere downstream."""

import pyspark.sql.functions as F

from docopenie_spark import datagen
from docopenie_spark.operators import assembly, bestmention, fused, ner
from docopenie_spark.plans.pipeline import default_dictionaries


def _norm(df):
    return df.select(
        "conv_id", "kind", "target", "best_mention",
        F.col("best_entity.name").alias("be_name"),
        F.col("best_entity.entity_type").alias("be_type"),
        "candidate_count",
    )


def test_join_based_equals_python(spark):
    t = datagen.transcripts_df(spark, 400)
    parsed = fused.parsed_sentences(assembly.with_turn_offsets(t))
    fn, gz, ln = default_dictionaries()
    ents = ner.split_mentions(ner.entities(parsed, fn, gz, ln))[0].cache()
    docs = assembly.doc_text_salted(t).cache()
    gzr = datagen.gazetteer_rows()
    a = _norm(bestmention.best_mentions(ents, docs, gzr))
    b = _norm(bestmention.best_mentions_python(ents, docs, gzr))
    assert a.exceptAll(b).isEmpty(), "join-based ⊄ python"
    assert b.exceptAll(a).isEmpty(), "python ⊄ join-based"
    assert a.count() > 0
