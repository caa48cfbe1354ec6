"""The native (zero-Python) coref must equal the applyInPandas reference
implementation row-for-row on the seeded corpus incl. the hot conversation."""

from docopenie_spark import datagen
from docopenie_spark.operators import assembly, coref, fused, ner
from docopenie_spark.plans.pipeline import default_dictionaries


def test_native_clusters_equal_python(spark):
    t = datagen.transcripts_df(spark, 400)
    parsed = fused.parsed_sentences(assembly.with_turn_offsets(t))
    fn, gz, ln = default_dictionaries()
    mentions = ner.entities(parsed, fn, gz, ln).cache()
    a = coref.clusters(mentions)
    b = coref.clusters_python(mentions)
    assert a.exceptAll(b).isEmpty(), "native ⊄ python"
    assert b.exceptAll(a).isEmpty(), "python ⊄ native"
    assert a.count() > 0
