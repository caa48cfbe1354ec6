"""Entity linking (SURVEY.md §2.3 T9/T10; reference tool/link/Linker.scala).

The reference builds an ArgContext per extraction argument (clean the
arg, gather context sentences via coref siblings) and calls an external
linker against an on-disk index, keeping links with combinedScore >= 5.0
(Linker.scala:63,156) and recomputing offsets from token + sentence
offset (:153-162).

Spark-first re-expression:
- candidate generation = a BROADCAST equi-join of normalized arg keys
  against the (small) entity dictionary exploded over name + aliases —
  the dictionary plays the role of the reference's linker index;
- scoring = deterministic column expressions (exact-name 6.0 / alias 5.5
  / word-containment 4.0 base, + 0.4·log10(1+inlinks)); only relative
  ordering and the 5.0 threshold are observable behavior (SURVEY.md U3);
- argmax per argument = row_number over a descending-score window —
  the reference's getBestEntity head-of-sorted-list.

Arg cleaning (P7, Linker.scala:73-82): exactly ONE leading token is
dropped if it is a determiner/preposition, then exactly ONE trailing
token likewise (``tokens.drop(1)`` / ``dropRight(1)`` — not a fixpoint).
The CLEANED text is only the linker QUERY; the emitted link carries the
ORIGINAL arg text and the original head offset (Linker.scala:153-160:
``FreeBaseLink(ac.arg.text, offset, …)`` with offset from the arg's
first token) — so link offsets equi-join exactly against mention/NER
offsets downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .tokenize import DETERMINERS, PREPOSITIONS

_STRIP_WORDS = sorted(DETERMINERS | PREPOSITIONS)
# anchored → at most one leading / one trailing token stripped (drop(1) /
# dropRight(1) parity); (?i) mirrors the reference's POS-based test which
# is case-insensitive on the surface form
_LEAD_PAT = r"(?i)^(?:%s)(?:\s+|$)" % "|".join(_STRIP_WORDS)
_TRAIL_PAT = r"(?i)(?:^|\s+)(?:%s)$" % "|".join(_STRIP_WORDS)


def exploded_args(triples_raw: DataFrame) -> DataFrame:
    """Distinct extraction arguments (Linker.scala:127 args.distinct)."""
    a = triples_raw.select(
        "conv_id",
        F.explode(F.array(F.col("arg1"), F.col("arg2"))).alias("p"),
    ).select("conv_id", F.col("p.text").alias("text"), F.col("p.offset").alias("offset"))
    return a.dropDuplicates(["conv_id", "offset", "text"])


def with_clean_arg(args: DataFrame) -> DataFrame:
    """P7: drop ONE leading and ONE trailing determiner/preposition token
    (Linker.scala:76-77). clean_offset is the doc offset of the first
    RETAINED character, measured from the actual stripped length — robust
    to multiple spaces between tokens."""
    after_lead = F.regexp_replace(F.col("text"), _LEAD_PAT, "")
    clean = F.regexp_replace(after_lead, _TRAIL_PAT, "")
    shift = (F.length("text") - F.length(after_lead)).cast("long")
    return args.select(
        "conv_id",
        "text",
        "offset",
        clean.alias("clean_text"),
        (F.col("offset") + shift).alias("clean_offset"),
    ).where(F.length("clean_text") > 0)


_CTX_BUCKET = 256  # chars per offset bucket in the containment joins


def _containment_join(points: DataFrame, spans: DataFrame, p_off, p_len, s_off, s_len):
    """points ⊆ spans interval join, bucketed on (conv_id, offset//B) so
    it stays skew-proof — no per-conversation cross product even for the
    hot conversation (SURVEY.md J3 pattern, same as substitute.py)."""
    p = points.withColumn("_b", (p_off / _CTX_BUCKET).cast("long"))
    s = spans.withColumn(
        "_b",
        F.explode(
            F.sequence(
                (s_off / _CTX_BUCKET).cast("long"),
                ((s_off + s_len) / _CTX_BUCKET).cast("long"),
            )
        ),
    )
    return p.join(s, ["conv_id", "_b"]).where(
        (p_off >= s_off) & (p_off + p_len <= s_off + s_len)
    ).drop("_b")


def arg_contexts(args: DataFrame, clusters: DataFrame, sentences: DataFrame) -> DataFrame:
    """T9 (Linker.scala:125-151): per cleaned argument, the context is the
    arg's OWN sentence plus every sentence containing a coref-cluster
    SIBLING of a mention inside the arg span (``fullText = (source +:
    extended).distinct``, Linker.scala:50). Returns (conv_id, offset,
    text, ctx) with ctx = distinct lowercase tokens of those sentences.

    All four steps are bucketed equi-joins — the reference's per-document
    nested loops become hash joins that scale past the hot conversation."""
    akey = ["conv_id", "offset", "text"]
    a = args.select(*akey, "clean_text", "clean_offset")
    s = sentences.select(
        "conv_id", F.col("offset").alias("s_off"),
        F.length("text").alias("s_len"), F.col("text").alias("s_text"),
    )
    # 1. the arg's own sentence
    own = _containment_join(
        a, s, F.col("clean_offset"), F.length("clean_text"), F.col("s_off"), F.col("s_len")
    ).select(*akey, "s_off", "s_text")
    # 2. cluster mentions inside the arg span
    cm = clusters.select(
        "conv_id", "cluster_id", F.explode("mentions").alias("m")
    ).select("conv_id", "cluster_id", F.col("m.offset").alias("m_off"),
             F.length("m.text").alias("m_len"))
    arg_clusters = _containment_join(
        cm, a,
        F.col("m_off"), F.col("m_len"), F.col("clean_offset"), F.length("clean_text"),
    ).select("conv_id", "offset", "text", "cluster_id").distinct()
    # 3. sibling mentions of those clusters
    siblings = arg_clusters.join(cm, ["conv_id", "cluster_id"]).select(
        "conv_id", "offset", "text", "m_off", "m_len"
    )
    # 4. sentences containing the siblings (the EXTENDED context)
    extended = _containment_join(
        siblings, s, F.col("m_off"), F.col("m_len"), F.col("s_off"), F.col("s_len")
    ).select(*akey, "s_off", "s_text")
    ctx_sents = own.unionByName(extended).dropDuplicates(akey + ["s_off"])
    return ctx_sents.groupBy(*akey).agg(
        F.array_distinct(
            F.flatten(F.collect_list(F.split(F.lower("s_text"), "\\s+")))
        ).alias("ctx")
    )


def links(
    triples_raw: DataFrame,
    entity_dict: DataFrame,
    min_combined_score: float = 5.0,
    clusters: DataFrame | None = None,
    sentences: DataFrame | None = None,
) -> DataFrame:
    """TRIPLES_RAW × entity_dict → LINKS (threshold = the reference's
    hardcoded minCombinedScore 5.0, Linker.scala:63). With clusters +
    sentences, doc_sim scores candidate context overlap against the T9
    arg context (round 1 stubbed it to 0.0) — two dictionary entries
    sharing an alias are disambiguated by context, not id order."""
    args = with_clean_arg(exploded_args(triples_raw))

    # explode the dictionary over name + aliases with a per-key kind
    cand = entity_dict.select(
        "id", "name", "types", "inlinks", F.col("context").alias("d_ctx"),
        F.explode(
            F.concat(
                F.array(F.struct(F.lower("name").alias("key"), F.lit("name").alias("src"))),
                F.transform(
                    "aliases",
                    lambda a: F.struct(F.lower(a).alias("key"), F.lit("alias").alias("src")),
                ),
            )
        ).alias("k"),
    ).select("id", "name", "types", "inlinks", "d_ctx",
             F.col("k.key").alias("key"), F.col("k.src").alias("src"))

    if clusters is not None and sentences is not None:
        # semi-join reduction: doc_sim only orders candidates WITHIN one
        # argument, so context matters only for args whose key matches
        # MORE THAN ONE dictionary entry — a tiny broadcast filter keeps
        # the 5-stage context machinery off the 99% unambiguous args
        # (their doc_sim is reported as 0; their selected link cannot
        # change). The reference computes docSim unconditionally against
        # its KB index; observable behavior — which entity each arg links
        # to, and the 5.0 threshold — is identical.
        multi = (
            cand.groupBy("key")
            .agg(F.countDistinct("id").alias("_n"))
            .where(F.col("_n") > 1)
            .select("key")
        )
        ambiguous = args.join(
            F.broadcast(multi), F.lower(args.clean_text) == multi.key, "left_semi"
        )
        ctx = arg_contexts(ambiguous, clusters, sentences)
        args = args.join(ctx, ["conv_id", "offset", "text"], "left")
    else:
        args = args.withColumn("ctx", F.lit(None).cast("array<string>"))

    j = args.join(
        F.broadcast(cand), F.lower(args.clean_text) == cand.key, "inner"
    )

    cand_score = F.when(F.col("src") == "name", F.lit(6.0)).otherwise(F.lit(5.5))
    inlink_score = 0.4 * F.log10(F.lit(1.0) + F.col("inlinks"))
    # context-token overlap, normalized by the entity's context size
    doc_sim = F.when(
        F.col("ctx").isNotNull() & F.col("d_ctx").isNotNull(),
        F.size(F.array_intersect("ctx", "d_ctx"))
        / F.greatest(F.size("d_ctx"), F.lit(1)).cast("double"),
    ).otherwise(F.lit(0.0))
    score = cand_score + inlink_score + doc_sim

    w = Window.partitionBy("conv_id", "offset", "text").orderBy(
        F.desc("score"), F.asc("id")
    )
    return (
        j.select(
            "conv_id",
            # the link carries the ORIGINAL arg text/offset; the cleaned
            # form is the query key only (Linker.scala:153-160)
            "text",
            "offset",
            "clean_text",
            "clean_offset",
            "name",
            "id",
            score.alias("score"),
            doc_sim.alias("doc_sim"),
            cand_score.alias("cand_score"),
            "inlinks",
            "types",
        )
        .where(F.col("score") >= min_combined_score)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
