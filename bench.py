"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the full KG pipeline (the flagship; triples/sec is the
north-rule throughput metric) + the scale-critical training-data ops
(MinHash-LSH dedup, SimHash near-dup, cosine top-k) + the relational
bread-and-butter (agg, broadcast join, interval join, window top-k).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from docopenie_spark import datagen  # noqa: E402
from docopenie_spark.operators import dedup, similarity  # noqa: E402
from docopenie_spark.plans.pipeline import run_pipeline  # noqa: E402
from docopenie_spark.session import get_spark  # noqa: E402

TURNS_PER_DOC = 8


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(
        app_name="docopenie-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    n_turns = TURNS_PER_DOC * n_docs

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # warmup: the full code path on a small slice so the timed numbers
    # measure the queries, not JVM/Arrow/Python-worker bring-up (the
    # driver runs this script cold; a long-lived cluster amortizes it)
    run_pipeline(spark, datagen.transcripts_df(spark, 2000)).triples.count()
    dedup.minhash_dedup(docs.limit(50), "doc_id", "text").count()
    dedup.simhash_near_dups(dedup.simhash(docs.limit(50), "doc_id", "text")).count()

    # flagship: full KG pipeline over seeded transcripts
    transcripts = datagen.transcripts_df(spark, n_turns)
    n_triples = timed(
        "kg_pipeline", lambda: run_pipeline(spark, transcripts).triples.count()
    )
    extras["n_triples"] = n_triples
    extras["n_turns"] = n_turns
    extras["triples_per_sec"] = round(n_triples / timings["kg_pipeline"], 1)
    extras["turns_per_sec"] = round(n_turns / timings["kg_pipeline"], 1)

    timed(
        "minhash_dedup",
        lambda: dedup.minhash_dedup(docs, "doc_id", "text", threshold=0.8).count(),
    )
    timed(
        "simhash_neardup",
        lambda: dedup.simhash_near_dups(dedup.simhash(docs, "doc_id", "text")).count(),
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 16)
    timed("embedding_topk", lambda: similarity.brute_force_topk(emb, q, k=10).count())

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    timed(
        "agg_lineitem",
        lambda: li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .count(),
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    timed(
        "broadcast_join",
        lambda: o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name").agg(F.sum("o_totalprice")).count(),
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
