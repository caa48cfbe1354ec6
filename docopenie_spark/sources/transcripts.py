"""Transcript-table sources.

Two ways to obtain the (conv_id, turn_idx, …, text) input table:

1. :func:`derived_from_documents` — a deterministic, SQL-expressible
   derivation from the driver-provided ``documents`` table: each document
   becomes one conversation, its text split into 10-word turns. Both this
   Spark form and the equivalent DuckDB SQL (``DERIVED_SQL_CTE``) follow
   the same spec, which is what makes the assembly/windowing queries
   oracle-checkable by the driver.
2. ``datagen.transcripts_df`` — the seeded natural-language generator used
   by the NLP stages (entities, pronouns, acronyms — things word-soup
   documents don't contain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORDS_PER_TURN = 10

# DuckDB CTE producing the identical derived transcripts (views are
# pre-registered by the driver). Keep in lockstep with the Spark code.
DERIVED_SQL_CTE = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), t AS (
  SELECT doc_id, words,
         unnest(generate_series(0, cast(ceil(len(words) / 10.0) AS BIGINT) - 1)) AS j
  FROM w
), transcripts AS (
  SELECT cast(doc_id AS VARCHAR) AS conv_id,
         cast(j AS INT) AS turn_idx,
         array_to_string(words[(j*10+1):(j*10+10)], ' ') AS text
  FROM t
)
"""


def derived_from_documents(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, …) → (conv_id, turn_idx, text), one turn
    per 10 words. Pure column ops (split/sequence/slice) — no UDF."""
    words = F.split(F.col("text"), " ")
    n_turns = F.ceil(F.size(words) / F.lit(float(WORDS_PER_TURN))).cast("int")
    turns = F.transform(
        F.sequence(F.lit(0), n_turns - 1),
        lambda j: F.array_join(F.slice(words, j * WORDS_PER_TURN + 1, WORDS_PER_TURN), " "),
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.posexplode(turns).alias("turn_idx", "text"),
    ).withColumn("turn_idx", F.col("turn_idx").cast("int"))
