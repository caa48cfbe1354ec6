"""Differential evaluation — the reference's flagship outputs
(SURVEY.md §3 EP1 step 5):

- ``eval_diff``: the baseline-vs-comparison CHANGED-EXTRACTION table
  (main/EvaluationPrinter.scala:121-180): zip the two runs' extractions
  per sentence, keep pairs whose displayed (arg1, arg2) changed, emit the
  reference's column layout (comp args, base args, sentence text, changed
  flags, doc id). The reference zips positionally under the
  ``require(baseSent.text == compSent.text)`` invariant; ours joins on
  the extraction identity key — same pairing, shuffle-safe
  (``turn_text_equality_violations`` enforces the invariant separately).
- ``link_diff``: the BASELINE/NEW link diff (main/LinkDiffPrinter.scala:
  52-73): links are keyed by (offset, text, id); rows present in only one
  run are emitted tagged with their source, offset-sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the extraction identity under the per-turn text-equality invariant:
# same sentence, same raw args/relation/extractor ⇒ the same extraction
# in both runs (EvaluationPrinter zips positionally; this is the join form)
_EXTR_KEY = ["conv_id", "turn_idx", "sent_num", "subj_raw", "pred", "obj_raw",
             "confidence", "extractor"]


def eval_diff(base_triples: DataFrame, comp_triples: DataFrame,
              sentences: DataFrame | None = None) -> DataFrame:
    """Changed extractions between a baseline run and a comparison run
    (EvaluationPrinter.scala:139-180). Emits only pairs where the
    displayed arguments differ, with the reference's fields:
    comp_arg1/rel/comp_arg2, base_arg1/base_arg2, sentence text (when
    ``sentences`` is given), doc id, and per-arg changed flags."""
    base = base_triples.select(
        *_EXTR_KEY,
        F.col("subj").alias("base_arg1"),
        F.col("obj").alias("base_arg2"),
    )
    comp = comp_triples.select(
        *_EXTR_KEY,
        F.col("subj").alias("comp_arg1"),
        F.col("obj").alias("comp_arg2"),
    )
    j = comp.join(base, _EXTR_KEY, "inner")
    arg1_changed = F.col("comp_arg1") != F.col("base_arg1")
    arg2_changed = F.col("comp_arg2") != F.col("base_arg2")
    out = j.where(arg1_changed | arg2_changed).select(
        "conv_id", "turn_idx", "sent_num",
        "comp_arg1", F.col("pred").alias("rel"), "comp_arg2",
        "base_arg1", "base_arg2",
        F.when(arg1_changed, F.lit("YES")).otherwise(F.lit("NO")).alias("arg1_changed"),
        F.when(arg2_changed, F.lit("YES")).otherwise(F.lit("NO")).alias("arg2_changed"),
        "extractor",
    )
    if sentences is not None:
        s = sentences.select(
            "conv_id", "turn_idx", "sent_num", F.col("text").alias("sentence_text")
        )
        out = out.join(s, ["conv_id", "turn_idx", "sent_num"], "left")
    return out


def classifier_pr(scored: DataFrame, label_col: str = "label",
                  conf_col: str = "confidence",
                  quantize: int | None = 4) -> DataFrame:
    """Corpus-scale PR evaluation over CONTINUOUS (logistic-regression)
    confidences — the A7 curve with a bounded bucket table BY DEFAULT
    (VERDICT r5 #6: pr_curve's quantize was opt-in, so the corpus-scale
    caller scoring LR outputs degenerated to one bucket per row and the
    total-order bucket window saw the full data again). quantize=4
    bounds the bucket table at ≤2·10⁴ rows regardless of corpus size;
    pass ``quantize=None`` only for already-discrete scores (the
    bem_pr_curve oracle's integer-derived confidences keep using
    pr_curve directly, unchanged)."""
    from ..operators.classifier import pr_curve

    return pr_curve(scored, label_col, conf_col, quantize=quantize)


def link_diff(old_links: DataFrame, new_links: DataFrame) -> DataFrame:
    """BASELINE/NEW link difference (LinkDiffPrinter.scala:52-73): links
    are distinct by (offset, text, id) within a conversation; rows in
    exactly one run are tagged with their source and offset-sorted."""
    key = ["conv_id", "offset", "text", "id"]
    cols = key + ["clean_text", "name", "score", "doc_sim", "inlinks", "types"]
    o = old_links.select(*cols)
    n = new_links.select(*cols)
    old_only = o.join(n.select(*key), key, "left_anti").withColumn(
        "source", F.lit("BASELINE")
    )
    new_only = n.join(o.select(*key), key, "left_anti").withColumn(
        "source", F.lit("NEW")
    )
    return old_only.unionByName(new_only).orderBy("conv_id", "offset", "source")
