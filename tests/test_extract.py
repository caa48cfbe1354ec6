"""Golden triple fixtures for the extractors (T4/T5), per SURVEY.md §5:
hand-verified triples for seeded sentences covering SVO, copular,
appositive/relnoun, and multi-arg2 flattening."""

from docopenie_spark.operators.extract import extract_sentence
from docopenie_spark.operators.tokenize import tokenize_sentence


def triples(text):
    toks = tokenize_sentence(text)
    return {(a1[0], r[0], a2[0], ext) for a1, r, a2, _c, ext in extract_sentence(toks, text)}


def test_svo():
    assert ("The GDC", "acquired", "the Summit Research Group", "verb") in triples(
        "The GDC acquired the Summit Research Group."
    )


def test_copular_vwp():
    got = triples("Brian Okafor is the president of the United Metrics Institute.")
    assert ("Brian Okafor", "is the president of", "the United Metrics Institute", "verb") in got


def test_appositive_relnoun():
    got = triples("Alice Navarro, founder of the Global Data Consortium, announced a merger.")
    assert ("Alice Navarro", "is founder of", "the Global Data Consortium", "relnoun") in got
    # the verbal extractor must still attribute the verb to the head NP
    assert ("Alice Navarro", "announced", "a merger", "verb") in got


def test_multi_arg2_flattening():
    got = triples("The CAB acquired the Harbor Light Industries in 2019.")
    assert ("The CAB", "acquired", "the Harbor Light Industries", "verb") in got
    assert ("The CAB", "acquired in", "2019", "verb") in got


def test_vwp_with_trailing_prep_swaps_not_stacks():
    got = triples("The Open Science Federation opened a lab in Austin in 2021.")
    rels = {r for _a1, r, _a2, _e in got}
    assert "opened a lab in" in rels
    assert not any("in in" in r for r in rels)


def test_infinitive_clause_skipped():
    got = triples("The team met in Austin, Texas to review the plan.")
    assert ("The team", "met in", "Austin", "verb") in got
    assert not any(r == "review" for _a1, r, _a2, _e in got)


def test_prepositional_subject_skipped():
    got = triples("The regulators in United States reviewed the filing from the GDC.")
    a1s = {a1 for a1, *_ in got}
    assert "The regulators" in a1s
    assert "United States" not in a1s


def test_offsets_and_token_indices():
    text = "Karen Osei works for the Pacific Trade Commission."
    toks = tokenize_sentence(text)
    res = extract_sentence(toks, text)
    (a1, rel, a2, conf, ext) = next(r for r in res if r[1][0] == "works for")
    assert text[a1[1] : a1[1] + len(a1[0])] == a1[0] == "Karen Osei"
    assert text[rel[1] : rel[1] + len(rel[0])] == rel[0]
    assert text[a2[1] : a2[1] + len(a2[0])] == a2[0] == "the Pacific Trade Commission"
    assert text[a1[1]:a1[1] + len(a1[0])] == a1[0] == "Karen Osei"


def test_pronoun_subject_lower_confidence():
    t1 = extract_sentence(tokenize_sentence("He visited Austin."), "He visited Austin.")
    t2 = extract_sentence(tokenize_sentence("Karen visited Austin."), "Karen visited Austin.")
    c_pron = next(c for _a, r, _b, c, _e in t1 if r[0] == "visited")
    c_name = next(c for _a, r, _b, c, _e in t2 if r[0] == "visited")
    assert c_pron < c_name
