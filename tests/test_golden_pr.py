"""End-to-end golden acceptance test (SURVEY.md §5 item 2; BASELINE.md
row 1-2): the full pipeline's (subj, pred, obj) set on the seeded fixture
corpus must match the frozen golden set at precision AND recall >= 0.95,
and the per-turn text-equality invariant must hold on the same corpus.

tests/golden_triples.json was generated from a reviewed pipeline run
(samples hand-checked against the seeded templates); regenerating it is a
deliberate act when extractor semantics intentionally change.
"""

import json
import os

from docopenie_spark import datagen
from docopenie_spark.operators import assembly
from docopenie_spark.plans.pipeline import run_pipeline

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_triples.json")


def test_triples_pr_vs_golden(spark):
    with open(GOLDEN) as f:
        golden = {tuple(r) for r in json.load(f)}
    t = datagen.transcripts_df(spark, 240)
    r = run_pipeline(spark, t)
    got = {
        (row.conv_id, row.turn_idx, row.sent_num, row.subj, row.pred, row.obj, row.extractor)
        for row in r.triples.collect()
    }
    tp = len(got & golden)
    precision = tp / len(got)
    recall = tp / len(golden)
    assert precision >= 0.95, f"precision {precision:.3f} < 0.95"
    assert recall >= 0.95, f"recall {recall:.3f} < 0.95"


def test_per_turn_text_equality_on_fixture_corpus(spark):
    t = datagen.transcripts_df(spark, 240)
    viol = assembly.turn_equality_violations(
        assembly.with_turn_offsets(t), assembly.doc_text_salted(t)
    )
    assert viol.isEmpty()
