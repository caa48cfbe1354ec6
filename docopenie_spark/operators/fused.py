"""Fused segment+tokenize stage.

Chained ``mapInPandas`` stages each attach their OWN Python worker to the
task pipeline — a task running segment → tokenize → extract drives three
Python processes with the JVM relaying Arrow batches between them. At 32
tasks that is ~100 worker processes and a kernel-level IPC storm (measured:
36% system time, anti-scaling from local[8] to local[32]).

The fix is architectural, not a config knob: fuse per-sentence work into
ONE UDF per task pipeline. ``parsed_sentences`` does segmentation (T2),
the P1 filter, and tokenization (T3) in a single Python worker; the
pipeline then persists its output, so the downstream extractors (T4/T5)
and NER (T7/T8) each read columnar cache with exactly one Python hop.

Semantics are identical to operators/segment.py + operators/tokenize.py
(shared pure-Python cores); a parity test asserts it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schemas
from ..functions import textnorm
from .segment import segment_turn
from .tokenize import tokenize_sentence


def _keep(s: str) -> bool:
    """P1 predicate, python twin of textnorm.sentence_keep (for stripped
    sentence text: #whitespace-runs >= 3 ⇔ #fields >= 4)."""
    return len(s) <= 750 and len(s.split()) >= 4


def parsed_sentences(turns_with_offsets: DataFrame, apply_filter: bool = True,
                     rebalance: bool = True) -> DataFrame:
    """Segment+tokenize, TURN-scoped. The upstream offset window partitions
    by conv_id, which strands the hot conversation (10% of all turns) in
    one partition — a hard single-task floor for the most expensive UDF.
    Since this stage needs no conv-locality, we rebalance on
    (conv_id, turn_idx) first: the per-turn hash spreads the hot
    conversation across every core (the skew-salting required by the
    north rule, applied where it actually pays)."""
    src = turns_with_offsets.select(
        "conv_id",
        "turn_idx",
        "turn_offset",
        textnorm.normalize_inline_ws(textnorm.asciify(F.col("text"))).alias("text"),
    )
    if rebalance:
        src = src.repartition(F.col("conv_id"), F.col("turn_idx"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for conv_id, turn_idx, turn_offset, text in zip(
                b["conv_id"], b["turn_idx"], b["turn_offset"], b["text"]
            ):
                for i, (local, s) in enumerate(segment_turn(text)):
                    if apply_filter and not _keep(s):
                        continue
                    toks = [
                        (d["token"], d["start"], d["pos"], d["chunk"], d["lemma"])
                        for d in tokenize_sentence(s)
                    ]
                    recs.append(
                        (conv_id, turn_idx, i, turn_offset + local, s, toks)
                    )
            yield pd.DataFrame(
                recs,
                columns=["conv_id", "turn_idx", "sent_num", "offset", "text", "tokens"],
            ).astype({"turn_idx": "int32", "sent_num": "int32", "offset": "int64"})

    return src.mapInPandas(run, schema=schemas.PARSED_SENTENCES)
