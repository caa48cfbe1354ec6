"""Similarity search over an embedding column (``array<float>``).

Two paths, same contract — (query_id, vec_id, cosine) top-k rows:

- brute-force: broadcast the (small) query set, JVM-side dot product via
  zip_with + aggregate, top-k per query with a row_number window. This is
  the exact baseline: at 100 TB it is a single broadcast-join scan over
  the corpus — embarrassingly parallel, no shuffle except the final
  per-query top-k (tiny).
- LSH-bucketed (random hyperplanes): deterministic signed projections
  bucket the corpus once; queries probe only their bucket. The hyperplane
  matrix is derived from xxhash64(dim, plane) so signatures are stable
  across runs with no stored model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", _norm(F.col(vec_col).cast("array<double>")))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k per query (query set broadcast)."""
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    j = c.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("_cv"), F.col("_qv")) / (F.col("_cn") * F.col("_qn"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        j.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplane_signature(vec_col, dims: int, planes: int = 16):
    """Deterministic random-hyperplane bit signature as a JVM expression.

    Plane p's weight for dimension d = (xxhash64(d*1000003 + p) % 1000) /
    500 - 1 ∈ [-1, 1) — stable, no stored model, whole-stage codegen'd.
    """
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = []
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.transform(
                    F.sequence(F.lit(0), F.lit(dims - 1)),
                    lambda d: (
                        F.pmod(F.xxhash64(d * 1000003 + F.lit(p)), F.lit(1000)).cast("double")
                        / 500.0
                        - 1.0
                    ),
                ),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dims: int,
    k: int = 10,
    planes: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate cosine top-k: probe only the query's hyperplane bucket."""
    sig = hyperplane_signature(F.col(vec_col).cast("array<double>"), dims, planes)
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
        F.col("_norm").alias("_cn"),
        sig.alias("bucket"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
        F.col("_norm").alias("_qn"),
        sig.alias("bucket"),
    )
    j = c.join(F.broadcast(q), "bucket").where(F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("_cv"), F.col("_qv")) / (F.col("_cn") * F.col("_qn"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        j.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
