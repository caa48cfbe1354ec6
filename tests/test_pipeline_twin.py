"""Full-pipeline composition parity on the REAL datagen corpus.

The 8 rows-only CORRECTNESS queries run over datagen transcripts no
DuckDB oracle can re-derive; this test gives every one of their stages
an independent check anyway: ``pipeline_twin.twin_pipeline`` recomputes
the whole pipeline imperatively (plain dict/loop re-implementations of
every DataFrame composition) and each stage must match ``run_pipeline``
EXACTLY, as a multiset, on the same 480-turn corpus — which includes
the hot conversation, cross-turn pronouns, 'City, ST' abbreviations,
acronym introductions, and multi-sentence turns (richer than the
injection word-soup corpora the ◆ oracles run on).
"""

from __future__ import annotations

import json

import pytest

from docopenie_spark import datagen
from docopenie_spark.plans.evaluation import eval_diff
from docopenie_spark.plans.pipeline import annotate, run_pipeline

from pipeline_twin import _eval_diff, twin_pipeline

N_TURNS = 480


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    return v


def _multiset(rows, keys):
    return sorted(
        json.dumps({k: _norm(r[k]) for k in keys}, sort_keys=True, default=str)
        for r in rows
    )


def _assert_stage(name, spark_df, twin_rows, keys):
    got = _multiset([r.asDict(recursive=True) for r in spark_df.collect()], keys)
    want = _multiset(twin_rows, keys)
    only_spark = [r for r in got if r not in set(want)]
    only_twin = [r for r in want if r not in set(got)]
    assert got == want, (
        f"{name}: spark={len(got)} twin={len(want)} rows; "
        f"spark-only {only_spark[:3]}; twin-only {only_twin[:3]}"
    )


@pytest.fixture(scope="module")
def runs(spark):
    t = datagen.transcripts_df(spark, N_TURNS)
    ann = annotate(spark, t)
    comp = run_pipeline(spark, t, annotated=ann)
    base = run_pipeline(spark, t, with_linking=False,
                        with_coref_expansion=False, annotated=ann)
    pdf = datagen.transcripts_pdf(N_TURNS)
    twin = twin_pipeline(pdf, datagen.entity_dict_rows(), datagen.gazetteer_rows())
    twin_base = twin_pipeline(pdf, datagen.entity_dict_rows(),
                              datagen.gazetteer_rows(),
                              with_linking=False, with_coref_expansion=False)
    yield comp, base, twin, twin_base
    base.unpersist()
    comp.unpersist()
    ann.unpersist()


def test_sentences_match(runs):
    comp, _, twin, _ = runs
    _assert_stage("sentences", comp.sentences, twin["sentences"],
                  ["conv_id", "turn_idx", "sent_num", "offset", "text"])


def test_triples_raw_match(runs):
    comp, _, twin, _ = runs
    _assert_stage(
        "triples_raw", comp.triples_raw, twin["triples_raw"],
        ["conv_id", "turn_idx", "sent_num", "arg1", "rel", "arg2",
         "confidence", "extractor"],
    )


def test_mentions_match(runs):
    comp, _, twin, _ = runs
    _assert_stage("mentions", comp.mentions, twin["mentions"],
                  ["conv_id", "text", "offset", "name", "entity_type"])


def test_clusters_match(runs):
    comp, _, twin, _ = runs
    _assert_stage("clusters", comp.clusters, twin["clusters"],
                  ["conv_id", "cluster_id", "best", "mentions"])


def test_links_match(runs):
    comp, _, twin, _ = runs
    _assert_stage(
        "links", comp.links, twin["links"],
        ["conv_id", "text", "offset", "clean_text", "clean_offset",
         "name", "id", "score", "doc_sim", "cand_score", "inlinks", "types"],
    )


_BEM_KEYS = ["conv_id", "kind", "target", "best_mention", "best_entity",
             "container_entity", "contained_entity", "candidate_count",
             "cluster_id"]


def test_best_mentions_match(runs):
    comp, _, twin, _ = runs
    _assert_stage("best_mentions", comp.best_mentions,
                  twin["best_mentions"], _BEM_KEYS)


def test_best_mentions_expanded_match(runs):
    comp, _, twin, _ = runs
    _assert_stage("best_mentions_expanded", comp.best_mentions_expanded,
                  twin["best_mentions_expanded"], _BEM_KEYS)


_TRIPLE_KEYS = ["conv_id", "turn_idx", "sent_num", "subj", "pred", "obj",
                "subj_raw", "obj_raw", "confidence", "extractor"]


def test_triples_match(runs):
    comp, _, twin, _ = runs
    _assert_stage("triples", comp.triples, twin["triples"], _TRIPLE_KEYS)


def test_baseline_triples_match(runs):
    _, base, _, twin_base = runs
    _assert_stage("baseline triples", base.triples, twin_base["triples"],
                  _TRIPLE_KEYS)


def test_bem_features_match(runs, spark):
    """U1 on the real corpus: the 13-feature build + stable bem_index
    (kg_bem_features' composition) against the imperative twin."""
    from docopenie_spark.operators import classifier
    from pipeline_twin import _bem_features

    comp, _, twin, _ = runs
    feats = classifier.bem_features(
        comp.best_mentions_expanded, comp.clusters, datagen.gazetteer_rows()
    )
    twin_feats = _bem_features(
        twin["best_mentions_expanded"], twin["clusters"], datagen.gazetteer_rows()
    )
    keys = ["conv_id", "bem_index", "kind", "target", "best_mention",
            *classifier.FEATURE_COLS]
    _assert_stage("bem_features", feats, twin_feats, keys)


def test_eval_diff_matches(runs):
    comp, base, twin, twin_base = runs
    spark_diff = eval_diff(base.triples, comp.triples, comp.sentences)
    twin_diff = _eval_diff(twin_base["triples"], twin["triples"],
                           twin["sentences"])
    _assert_stage(
        "eval_diff", spark_diff, twin_diff,
        ["conv_id", "turn_idx", "sent_num", "comp_arg1", "rel", "comp_arg2",
         "base_arg1", "base_arg2", "arg1_changed", "arg2_changed",
         "extractor", "sentence_text"],
    )


def test_twin_nonvacuous(runs):
    """The corpus must actually exercise the compositions: clusters with
    pronoun members, links, non-identity best mentions, coref-expansion
    rows of BOTH gate polarities, substituted triples, and a non-empty
    differential — otherwise the parity above proves nothing."""
    comp, base, twin, twin_base = runs
    assert len(twin["links"]) > 50
    kinds = {b["kind"] for b in twin["best_mentions_expanded"]}
    assert {"identity", "coref_link"} <= kinds
    assert any(k.startswith("coref") for k in kinds)
    # both XOR-gate outcomes fire on this corpus: personal pronouns of
    # PERSON clusters propagate; "she"/"him" (in PRONOUNS but NOT in the
    # reference's PERSONAL_PRONOUNS set — replicated verbatim) are
    # BLOCKED by the gate, so they must appear in cluster mentions yet
    # never as expansion targets. (Non-PERSON expansion needs it/their
    # pronouns the datagen templates don't emit; that polarity is pinned
    # by the kg_coref_expansion oracle's injection corpus instead.)
    xrows = [b for b in twin["best_mentions_expanded"]
             if b["kind"].startswith("coref")]
    assert any(b["target"]["entity_type"] == "PERSON" for b in xrows)
    cluster_pron_texts = {
        m["text"].lower()
        for c in twin["clusters"] for m in c["mentions"]
        if m["text"].lower() in {"she", "him"}
    }
    assert cluster_pron_texts, "corpus lost its gate-blocked pronouns"
    expanded_texts = {b["target"]["text"].lower() for b in xrows}
    assert not (cluster_pron_texts & expanded_texts)
    changed = _eval_diff(twin_base["triples"], twin["triples"], twin["sentences"])
    assert len(changed) > 10
    assert any(t["subj"] != t["subj_raw"] or t["obj"] != t["obj_raw"]
               for t in twin["triples"])
