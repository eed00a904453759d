"""Local replica of the driver's correctness gate: run every queries()
entry on Spark at sf0.01, run the matching oracle_sql() on DuckDB over
the same parquet views, compare row count + (sorted-by-name) columns +
order-insensitive value hash.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\\N"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return f"{v:.6f}" if abs(v) < 1e10 else repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def value_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = []
    for t in pdf[cols].itertuples(index=False):
        rows.append("\x1f".join(norm_cell(v) for v in t))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .appName("selfcheck")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            results[name] = {"status": "SPARK_ERROR", "error": str(e)[:300]}
            print(f"[FAIL spark] {name}: {e}")
            continue
        if name not in oracles:
            results[name] = {"status": "ROWS_ONLY", "rows": len(sdf),
                             "sec": round(time.time() - t0, 2)}
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:300]}
            print(f"[FAIL oracle] {name}: {e}")
            continue
        ok_rows = len(sdf) == len(odf)
        ok_schema = sorted(map(str.lower, sdf.columns)) == \
            sorted(map(str.lower, odf.columns))
        h_s = value_hash(sdf) if ok_schema else None
        h_o = value_hash(odf) if ok_schema else None
        ok_hash = ok_schema and h_s == h_o
        status = "MATCH" if (ok_rows and ok_schema and ok_hash) else "MISMATCH"
        results[name] = {"status": status, "rows_spark": len(sdf),
                         "rows_oracle": len(odf), "schema_ok": ok_schema,
                         "hash_ok": ok_hash,
                         "sec": round(time.time() - t0, 2)}
        print(f"[{status}] {name}: spark={len(sdf)} oracle={len(odf)} "
              f"schema={ok_schema} hash={ok_hash} "
              f"({results[name]['sec']}s)")
        if status == "MISMATCH" and ok_schema:
            cols = sorted(sdf.columns)
            s_sorted = sdf[cols].sort_values(cols).reset_index(drop=True)
            o_sorted = odf[cols].sort_values(cols).reset_index(drop=True)
            print("  spark head:\n", s_sorted.head(3).to_string())
            print("  oracle head:\n", o_sorted.head(3).to_string())

    n_match = sum(1 for r in results.values() if r["status"] == "MATCH")
    n_bad = sum(1 for r in results.values()
                if r["status"] not in ("MATCH", "ROWS_ONLY"))
    print(f"\n== {n_match} MATCH, "
          f"{sum(1 for r in results.values() if r['status']=='ROWS_ONLY')} "
          f"rows-only, {n_bad} problems ==")
    with open("/tmp/selfcheck.json", "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
