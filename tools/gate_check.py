"""Local replay of the driver's correctness gate at an arbitrary sf dir.

Runs selected __spark_entry__ queries AND their DuckDB oracles on the
same parquet, comparing column names, row counts, and order-insensitive
values (the sf1_check canonicalization, without the sf1 generation).

Usage: python tools/gate_check.py [--sf /root/testdata/sf0.01] [--only q1,q2]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("gate-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    only = [q for q in args.only.split(",") if q]
    names = only or sorted(queries)

    con = _duck(args.sf)
    fails = 0
    for name in names:
        t0 = time.time()
        try:
            df = queries[name](spark, args.sf)
            cols = df.columns
            rows = df.collect()
            sql = oracles.get(name)
            if sql is None:
                print(f"{name}: rows={len(rows)} (no oracle)", flush=True)
                continue
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            schema_ok = sorted(cols) == sorted(ocols)
            rows_ok = len(rows) == len(orows)
            vals_ok = _canon(rows, cols) == _canon(orows, ocols)
            ok = schema_ok and rows_ok and vals_ok
            fails += 0 if ok else 1
            print(
                f"{name}: {'PASS' if ok else 'FAIL'} rows={len(rows)}/"
                f"{len(orows)} schema={schema_ok} vals={vals_ok} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
        except Exception as e:  # pragma: no cover - diagnostic tool
            fails += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
