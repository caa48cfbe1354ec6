"""Display-form substitution → final triples (SURVEY.md §2.3 T13 + O7;
reference main/EvaluationPrinter.scala:74-101 and tool/link/Linker.scala:88-120).

The reference splices best-mention names into each argument's text via a
char-indexed copy, keeping only substitutions whose intervals do not
overlap a previously kept one (greedy, input-order — O7). Ours is FULLY
NATIVE Spark:

- the (argument × best-mention) interval-containment join (J3/§1.4) is
  an equi-join on (conv_id, offset-bucket) plus a range predicate — the
  bucket key keeps the join skew-proof even for the hot conversation
  (no per-conversation grouping anywhere in this stage);
- the greedy non-overlap selection + splice is a single ``F.aggregate``
  over the offset-sorted substitution array — a JVM-side fold,
  whole-stage-codegen'd, no Python at all.

Order parity: the reference iterates substitutions in best-mention input
order, which is entity/offset order — our sort_array on (offset, …)
reproduces it deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from .. import schemas

BUCKET = 256  # chars per offset bucket in the interval join


def _triple_id():
    return F.xxhash64(
        "conv_id", "turn_idx", "sent_num",
        F.col("arg1.offset"), F.col("rel.offset"), F.length("rel.text"),
        F.col("arg2.offset"), "extractor",
    )


def _subst_expr(text_col, off_col, subs_col):
    """Greedy non-overlap splice (O7) as a native fold over sorted subs.

    subs: array<struct<rel_start:int, rel_end:int, best:string>> sorted by
    rel_start; rel_* are char positions within the argument text.
    """
    acc0 = F.struct(F.lit(0).cast("int").alias("cursor"), F.lit("").alias("out"))

    def step(acc, s):
        keep = s["rel_start"] >= acc["cursor"]
        new_out = F.concat(
            acc["out"],
            F.substring(text_col, acc["cursor"] + 1, s["rel_start"] - acc["cursor"]),
            s["best"],
        )
        return F.when(
            keep,
            F.struct(s["rel_end"].cast("int").alias("cursor"), new_out.alias("out")),
        ).otherwise(acc)

    return F.aggregate(
        subs_col,
        acc0,
        step,
        lambda acc: F.concat(
            acc["out"], F.substring(text_col, acc["cursor"] + 1, F.length(text_col))
        ),
    )


def substituted_triples(triples_raw: DataFrame, bems_display: DataFrame) -> DataFrame:
    """TRIPLES_RAW + displayable BEST_MENTIONS → TRIPLES (canonical strings)."""
    t = triples_raw.withColumn("tid", _triple_id())

    args = t.select(
        "conv_id",
        "tid",
        F.explode(
            F.array(
                F.struct(F.lit("arg1").alias("which"), F.col("arg1").alias("part")),
                F.struct(F.lit("arg2").alias("which"), F.col("arg2").alias("part")),
            )
        ).alias("a"),
    ).select(
        "conv_id", "tid", "a.which",
        F.col("a.part.text").alias("text"), F.col("a.part.offset").alias("offset"),
    )

    m = bems_display.select(
        "conv_id",
        F.col("target.offset").alias("m_off"),
        F.length("target.text").alias("m_len"),
        "best_mention",
    )

    # bucketed interval-containment join: mention ∈ [arg start, arg end]
    args_b = args.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                (F.col("offset") / BUCKET).cast("long"),
                ((F.col("offset") + F.length("text")) / BUCKET).cast("long"),
            )
        ),
    )
    m_b = m.withColumn("bucket", (F.col("m_off") / BUCKET).cast("long"))

    joined = args_b.join(
        m_b,
        ["conv_id", "bucket"],
    ).where(
        (F.col("m_off") >= F.col("offset"))
        & (F.col("m_off") + F.col("m_len") <= F.col("offset") + F.length("text"))
    )

    sub_t = StructType(
        [
            StructField("rel_start", IntegerType()),
            StructField("rel_end", IntegerType()),
            StructField("best", StringType()),
        ]
    )
    subs = (
        joined.groupBy("conv_id", "tid", "which", "text", "offset")
        .agg(
            F.sort_array(
                F.collect_set(
                    F.struct(
                        (F.col("m_off") - F.col("offset")).cast("int").alias("rel_start"),
                        (F.col("m_off") + F.col("m_len") - F.col("offset")).cast("int").alias("rel_end"),
                        F.col("best_mention").alias("best"),
                    )
                )
            ).alias("subs")
        )
        .select(
            "tid", "which",
            _subst_expr(F.col("text"), F.col("offset"), F.col("subs")).alias("subst"),
        )
    )

    pivoted = subs.groupBy("tid").agg(
        F.max(F.when(F.col("which") == "arg1", F.col("subst"))).alias("subj_sub"),
        F.max(F.when(F.col("which") == "arg2", F.col("subst"))).alias("obj_sub"),
    )

    out = t.join(pivoted, "tid", "left").select(
        "conv_id",
        "turn_idx",
        "sent_num",
        F.coalesce("subj_sub", F.col("arg1.text")).alias("subj"),
        F.col("rel.text").alias("pred"),
        F.coalesce("obj_sub", F.col("arg2.text")).alias("obj"),
        F.col("arg1.text").alias("subj_raw"),
        F.col("arg2.text").alias("obj_raw"),
        "confidence",
        "extractor",
    )
    return out
