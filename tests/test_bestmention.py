"""One pytest per rule branch of the T11 canonicalizer (SURVEY.md §7 step 6)
+ the T12 XOR propagation gate."""

from docopenie_spark import datagen
from docopenie_spark.operators import bestmention as bm

GAZ = datagen.gazetteer_rows()
GAZ_CONTAINER = {r[0]: r[2] for r in GAZ if r[2]}
ABBREV = {r[4]: r[0] for r in GAZ if len(r) > 4 and r[4]}


def test_org_acronym_expansion():
    cands = [("Global Data Consortium", 10), ("Quantum Relay Systems", 90)]
    got = bm.best_org("GDC", 60, cands, "")
    assert got[0] == "Global Data Consortium"


def test_org_acronym_doc_regex_fallback():
    doc = "We met the Global Data Consortium (GDC) yesterday."
    got = bm.best_org("GDC", 44, [], doc)
    assert got[0] == "Global Data Consortium"


def test_org_word_prefix_suffix_containment():
    cands = [("Harbor Light Industries", 5)]
    assert bm.best_org("Harbor Light", 80, cands, "")[0] == "Harbor Light Industries"
    assert bm.best_org("Light Industries", 80, cands, "")[0] == "Harbor Light Industries"


def test_org_char_prefix_one_word():
    assert bm.best_org("Quant", 0, [("Quantum", 9)], "")[0] == "Quantum"


def test_org_proximity_sort_first_match():
    # two valid expansions — nearest by |offset| wins (ref :129-132)
    cands = [("Global Data Consortium", 500), ("Global Data Corporation", 90)]
    got = bm.best_org("GDC", 100, cands, "")
    assert got[0] == "Global Data Corporation"
    assert got[2] == 0.5  # candidate_count = 1/|distinct names| (ref :433)


def test_loc_sibling_ner_pair():
    got = bm.best_loc("Austin", 10, [("Austin, Texas", 80)], "", {}, {})
    assert got[0] == "Austin, Texas"


def test_loc_gazetteer_containment():
    got = bm.best_loc("Boulder", 10, [], "", GAZ_CONTAINER, ABBREV)
    assert got[0] == "Boulder, Colorado"


def test_loc_doc_regex_least_frequent_verbatim():
    # reference's sortBy(_._2).head takes the LEAST frequent (SURVEY A4)
    doc = "Salem, OR is nice. Salem, OR is big. Salem, Massachusetts though."
    got = bm.best_loc("Salem", 0, [], doc, {}, ABBREV)
    assert got[0] == "Salem, Massachusetts"


def test_loc_state_abbrev_expansion():
    doc = "They met in Springfield, MA. It rained."
    got = bm.best_loc("Springfield", 12, [], doc, {}, ABBREV)
    assert got[0] == "Springfield, Massachusetts"


def test_person_word_suffix_under_4_words():
    got = bm.best_person("Navarro", 100, [("Alice Navarro", 10)], "")
    assert got[0] == "Alice Navarro"
    # candidates with >= 4 words are rejected (ref :375-393)
    assert bm.best_person("Navarro", 100, [("Alice Maria Luisa Navarro", 10)], "") is None


def test_person_name_regex_fallback():
    doc = "Yesterday we saw Brian Okafor at the office."
    got = bm.best_person("Okafor", 60, [], doc)
    assert got[0] == "Brian Okafor"


def test_location_casing():
    assert bm.location_casing("NEW jersey") == "New Jersey"
    assert bm.location_casing("D.C. area") == "D.C. Area"


def test_personal_pronoun_gate_semantics():
    # verbatim reference set: "his" yes, "she" no (DocumentExtractor.scala:140)
    assert "his" in bm.PERSONAL_PRONOUNS
    assert "she" not in bm.PERSONAL_PRONOUNS
    assert "him" not in bm.PERSONAL_PRONOUNS


def test_t12_expansion_via_pipeline(spark):
    from docopenie_spark.plans.pipeline import run_pipeline

    t = datagen.transcripts_df(spark, 160)
    r = run_pipeline(spark, t)
    kinds = {row.kind for row in r.best_mentions_expanded.select("kind").distinct().collect()}
    assert "coref_link" in kinds or "coref_full" in kinds or "coref_identity" in kinds
    # XOR gate: coref-propagated PERSON rows must use personal pronouns only
    bad = r.best_mentions_expanded.where(
        (r.best_mentions_expanded.kind.startswith("coref"))
    ).collect()
    for row in bad:
        is_personal = row.target.text.lower() in bm.PERSONAL_PRONOUNS
        not_person = row.target.entity_type != "PERSON"
        assert is_personal ^ not_person, row
