"""Record a driver-format correctness artifact (CORRECTNESS_r{N}.json)
from the same Spark-vs-DuckDB comparison check_oracle.py performs.

    python tools/record_correctness.py CORRECTNESS_r05.json [sf_dir]

Keys per query mirror the driver: rows_match / schema_match /
hash_match / spark_rows / oracle_rows / err ("no_oracle" for entries
without oracle_sql, null comparisons recorded as the driver does).
"""

from __future__ import annotations

import json
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from check_oracle import TABLES, normalize  # noqa: E402


def main():
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import __spark_entry__ as e
    from docopenie_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracles = e.oracle_sql()
    result: dict[str, dict] = {}
    for name, fn in e.queries().items():
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            spdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(spdf)
            if name not in oracles:
                rec["err"] = "no_oracle"
            else:
                opdf = con.execute(oracles[name]).df()
                rec["oracle_rows"] = len(opdf)
                a, b = normalize(spdf), normalize(opdf)
                rec["rows_match"] = len(a) == len(b)
                rec["schema_match"] = list(a.columns) == list(b.columns)
                ok = rec["rows_match"] and rec["schema_match"]
                if ok:
                    for c in a.columns:
                        if (pd.api.types.is_float_dtype(a[c])
                                and pd.api.types.is_float_dtype(b[c])):
                            ok = bool(np.allclose(
                                a[c].to_numpy(), b[c].to_numpy(),
                                atol=1e-3, equal_nan=True))
                        else:
                            ok = a[c].astype(str).equals(b[c].astype(str))
                        if not ok:
                            break
                rec["hash_match"] = bool(ok)
        except Exception as exc:  # record, never abort the sweep
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        result[name] = rec
        print(name, "->", rec["err"] or ("MATCH" if rec["hash_match"] else "FAIL"),
              flush=True)

    spark.stop()
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    bad = [n for n, r in result.items()
           if r["err"] not in (None, "no_oracle") or r["hash_match"] is False]
    print("wrote", out_path, "failures:", bad)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
