"""The fused segment+tokenize stage must be row-identical to the
separate stages (operators/fused.py parity contract)."""

from docopenie_spark import datagen
from docopenie_spark.operators import assembly, fused, segment
from docopenie_spark.operators import tokenize as tok


def test_fused_equals_chained(spark):
    t = datagen.transcripts_df(spark, 240)
    turns = assembly.with_turn_offsets(t)
    chained = tok.parsed_sentences(segment.sentences(turns))
    f = fused.parsed_sentences(turns)
    assert f.exceptAll(chained).isEmpty()
    assert chained.exceptAll(f).isEmpty()
