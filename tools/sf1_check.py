"""Full 50-gate correctness check at sf1 (10x sf0.1) — VERDICT r04 #9.

Generates a deterministic sf1 dataset (10 stride-offset copies of the
driver's sf0.1 parquet: copy 0 is byte-identical, so every id-anchored
gate subset — doc_id<200 media images, vec_id<64 k-means, vec_id<10
queries — keeps its original rows; dimension tables region/nation/
supplier/part stay 1x and every copy's foreign keys still resolve),
then replays the driver's correctness gate on it: each
__spark_entry__ query AND its DuckDB oracle on the SAME parquet,
comparing column names, row counts, and order-insensitive values.

Outputs whose row count exceeds ROW_CAP are compared by per-column
integer aggregates instead (count, sums of ints / string lengths,
min/max) — python-side canonicalization of 48M-row outputs (the sf1
dq_flat_lineitem) is not feasible; the aggregate fallback is recorded
per-query in the results JSON so the weaker check is visible.

Usage: python tools/sf1_check.py [--root /tmp/qs_sf1] [--only q1,q2]
Writes sf1_gate_results.json next to this script's repo root.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_SF = "/root/testdata/sf0.1"
COPIES = 10
ROW_CAP = 2_000_000

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: key columns offset per copy i by i * stride. Dimension tables
#: (region/nation/supplier/part) are NOT replicated; fact foreign keys
#: into them stay unchanged, so all joins still resolve.
OFFSETS = {
    "customer": {"c_custkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {"l_orderkey": 100_000_000},
    "events": {"event_id": 100_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}


def generate(spark, root: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(root, exist_ok=True)
    for t in TABLES:
        out = f"{root}/{t}.parquet"
        if os.path.exists(out):
            continue
        src = spark.read.parquet(f"{SRC_SF}/{t}.parquet")
        if t not in OFFSETS:
            src.write.mode("overwrite").parquet(out)
            continue
        parts = []
        for i in range(COPIES):
            c = src
            for col, stride in OFFSETS[t].items():
                c = c.withColumn(col, F.col(col) + F.lit(i * stride))
            if t == "documents" and True:
                # non-zero copies get a per-copy suffix: near-dup (not
                # exact-dup) structure, like the round-4 bench data
                if i:
                    c = c.withColumn(
                        "text", F.concat(F.col("text"), F.lit(f" c{i}"))
                    )
            if t == "embeddings" and i:
                # deterministic ±2% perturbation keyed by (vec_id, i)
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (x, j) -> CAST(x * (1.0 + "
                        f"0.02 * (pmod(xxhash64(vec_id, j, {i}), 401) - 200) / 200.0"
                        ") AS FLOAT))"
                    ),
                )
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out)
        print(f"generated {t}", flush=True)


def _duck(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark writes a DIRECTORY of part files; DuckDB needs a glob
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


def _agg_signature_spark(df):
    """Deterministic per-column integer aggregates for huge outputs."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType)):
            aggs.append(F.sum(F.col(f.name).cast("bigint")).alias(f"s_{f.name}"))
            aggs.append(F.min(f.name).cast("bigint").alias(f"mn_{f.name}"))
            aggs.append(F.max(f.name).cast("bigint").alias(f"mx_{f.name}"))
        elif isinstance(f.dataType, T.StringType):
            aggs.append(
                F.sum(F.length(f.name).cast("bigint")).alias(f"l_{f.name}")
            )
    row = df.groupBy().agg(*aggs).collect()[0]
    return {k: (None if row[k] is None else int(row[k])) for k in row.asDict()}


def _agg_signature_duck(con, sql, spark_schema):
    from pyspark.sql import types as T

    parts = ["CAST(count(*) AS BIGINT) AS __n"]
    for f in spark_schema.fields:
        if isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType)):
            parts.append(f'CAST(sum("{f.name}") AS BIGINT) AS "s_{f.name}"')
            parts.append(f'CAST(min("{f.name}") AS BIGINT) AS "mn_{f.name}"')
            parts.append(f'CAST(max("{f.name}") AS BIGINT) AS "mx_{f.name}"')
        elif isinstance(f.dataType, T.StringType):
            parts.append(
                f'CAST(sum(length("{f.name}")) AS BIGINT) AS "l_{f.name}"'
            )
    res = con.execute(f"SELECT {', '.join(parts)} FROM ({sql})")
    cols = [d[0] for d in res.description]
    row = res.fetchone()
    return {c: (None if v is None else int(v)) for c, v in zip(cols, row)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/qs_sf1")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    from bench import make_spark

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark, args.root)

    import __spark_entry__ as em

    names = sorted(em.queries())
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]
    oracles = em.oracle_sql()
    # Per-entry provenance (VERDICT r10 #5): composite sweeps (--only
    # merges) mix entries from different HEADs; each entry records the
    # sha + time it ran at so the artifact self-audits instead of
    # depending on prose.
    import subprocess

    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=REPO,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        head = None
    results = {}
    for name in names:
        t0 = time.perf_counter()
        rec = {
            "mode": "full",
            "ok": False,
            "git_head": head,
            "ran_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        try:
            sdf = em.queries()[name](spark, args.root)
            sql = oracles.get(name)
            if sql is None:
                rec["mode"] = "rows_only"
                rec["rows"] = sdf.count()
                rec["ok"] = rec["rows"] >= 0
            else:
                n = sdf.count()
                rec["rows"] = n
                con = _duck(args.root)
                if n > ROW_CAP:
                    rec["mode"] = "agg"
                    s = _agg_signature_spark(sdf)
                    d = _agg_signature_duck(con, sql, sdf.schema)
                    rec["ok"] = s == d
                    if not rec["ok"]:
                        rec["spark"] = s
                        rec["duck"] = d
                else:
                    dres = con.execute(sql)
                    dcols = [x[0] for x in dres.description]
                    drows = dres.fetchall()
                    srows = sdf.collect()
                    rec["ok"] = (
                        sorted(sdf.columns) == sorted(dcols)
                        and len(srows) == len(drows)
                        and _canon(srows, sdf.columns) == _canon(drows, dcols)
                    )
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            rec["err"] = f"{type(e).__name__}: {e}"[:400]
        rec["sec"] = round(time.perf_counter() - t0, 2)
        results[name] = rec
        print(
            f"{name}: {'PASS' if rec.get('ok') else 'FAIL'} "
            f"({rec['mode']}, {rec['sec']}s)"
            + (f" err={rec.get('err')}" if "err" in rec else ""),
            flush=True,
        )

    out = os.path.join(REPO, "sf1_gate_results.json")
    if args.only and os.path.exists(out):
        # --only reruns merge into the existing full record. The merge
        # (VERDICT r11 #5) PRUNES keys that left the driver window and
        # guarantees per-entry provenance: entries run now carry
        # git_head; carried-forward entries keep the git_head /
        # inherited_from they already have (the r12 backfill stamped
        # every legacy entry from the file's git history), and any
        # entry that would end up sha-less is stamped
        # inherited_from=<current merge HEAD> as a visible last resort.
        with open(out) as fh:
            prev = json.load(fh).get("results", {})
        prev.update(results)
        live = set(em.queries())
        results = {k: v for k, v in prev.items() if k in live}
        for k, v in results.items():
            if not v.get("git_head") and not v.get("inherited_from"):
                v["inherited_from"] = head
    with open(out, "w") as fh:
        json.dump(
            {
                "sf_root": args.root,
                "copies": COPIES,
                "row_cap": ROW_CAP,
                "passed": sum(1 for r in results.values() if r.get("ok")),
                "total": len(results),
                "mode_counts": {
                    m: sum(1 for r in results.values() if r.get("mode") == m)
                    for m in ("full", "agg", "rows_only")
                },
                "results": results,
            },
            fh,
            indent=1,
        )
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
