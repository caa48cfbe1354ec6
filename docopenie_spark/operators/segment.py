"""Sentence segmentation (SURVEY.md §2.3 T2; reference
prep/Sentencer.scala:55-94).

The reference runs a statistical segmenter per paragraph and computes
each segment's document offset as a prefix-sum of segment lengths. Ours
is a deterministic rule segmenter (terminator chars + closing quotes)
run per TURN inside ``mapInPandas`` — turn-scoped, so the stage is
NARROW: no shuffle between assembly and extraction. Offsets are computed
exactly the reference's way: locate each segment in the original turn
text and add the turn's document offset.

``sent_num`` is the 0-based sentence index WITHIN the turn; the stable
sentence key is the compound (conv_id, turn_idx, sent_num) — this keeps
numbering closed-form per turn (no cross-turn window / shuffle), which is
what survives at 10^12 turns. (The reference numbers per document,
prep/Sentencer.scala:91 — a driver-side zipWithIndex that does not
distribute; the compound key carries identical information under the
stable turn ordering.)
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schemas
from ..functions import textnorm

# A sentence: run of non-terminator chars, then terminators, then optional
# closing quotes/brackets — or a trailing fragment with no terminator.
_SENT_RE = re.compile(r"[^.!?]+[.!?]+[\"'\)\]]*|[^.!?]+$")
_WS = re.compile(r"\s+")


def segment_turn(text: str) -> list[tuple[int, str]]:
    """Deterministic segmentation of one turn → [(local_offset, sentence)].

    Offsets address the ORIGINAL text (leading whitespace skipped, exactly
    like the reference's offset arithmetic in prep/Sentencer.scala:78-90).
    """
    out = []
    for m in _SENT_RE.finditer(text):
        raw = m.group()
        lead = len(raw) - len(raw.lstrip())
        s = raw.strip()
        if s:
            out.append((m.start() + lead, s))
    return out


def sentences(turns_with_offsets: DataFrame, apply_filter: bool = True) -> DataFrame:
    """turns (+offsets) → SENTENCES table.

    Applies P2 (length-preserving asciify, native translate) BEFORE
    segmentation and P1 (length / word-count filter) after — the same
    early-filter ordering the reference uses so the expensive parse never
    sees junk (prep/Sentencer.scala:105-107; SURVEY.md §4).
    """
    src = turns_with_offsets.select(
        "conv_id",
        "turn_idx",
        "turn_offset",
        textnorm.normalize_inline_ws(textnorm.asciify(F.col("text"))).alias("text"),
    )

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for conv_id, turn_idx, turn_offset, text in zip(
                b["conv_id"], b["turn_idx"], b["turn_offset"], b["text"]
            ):
                for i, (local, s) in enumerate(segment_turn(text)):
                    recs.append((conv_id, turn_idx, i, turn_offset + local, s))
            yield pd.DataFrame(
                recs, columns=["conv_id", "turn_idx", "sent_num", "offset", "text"]
            ).astype({"turn_idx": "int32", "sent_num": "int32", "offset": "int64"})

    out = src.mapInPandas(seg, schema=schemas.SENTENCES)
    if apply_filter:
        out = out.where(textnorm.sentence_keep("text"))
    return out
