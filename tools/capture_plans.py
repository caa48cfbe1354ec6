"""Capture .explain("formatted") for declared queries into plans/<tag>/.

Usage: python tools/capture_plans.py <out_dir> <suffix> [query ...]
  out_dir: e.g. plans/r07
  suffix:  e.g. before / after
  query:   optional subset; default = every declared query

$SPARK_GRAFT_SF_DIR picks the data dir (default sf0.01 — the driver's
correctness scale). Plans are the pre-execution physical plans
(AdaptiveSparkPlan isFinalPlan=false) — what the optimizer chose from
the written query shape, which is the thing code changes move.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from docopenie_spark.session import get_spark  # noqa: E402


def main():
    out_dir, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture the failure instead of dying
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
