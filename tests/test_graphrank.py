"""Integer-exact PageRank (operators/graphrank.py): pure-python spec
cross-check, partitioning invariance, DuckDB oracle parity, and the
domain recipe."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from quality_spark.operators.graphrank import (
    domain_link_edges,
    domain_pagerank,
    pagerank,
    pagerank_oracle_sql,
)


def _py_pagerank(edges, iters, d=(85, 100), total=10**12):
    """Independent pure-python reference of the documented integer
    spec — NOT a copy of the DataFrame code."""
    d_num, d_den = d
    e = sorted(set(edges))
    out = {}
    for s, _ in e:
        out[s] = out.get(s, 0) + 1
    nodes = sorted({s for s, _ in e} | {t for _, t in e})
    n = len(nodes)
    base = ((d_den - d_num) * total) // (d_den * n)
    r = {v: total // n for v in nodes}
    for _ in range(iters):
        dmass = sum(r[v] for v in nodes if v not in out)
        nxt = {v: base + (d_num * dmass) // (d_den * n) for v in nodes}
        for s, t in e:
            nxt[t] += (d_num * r[s]) // (d_den * out[s])
        r = nxt
    return r


EDGES = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("c", "a"),
    ("a", "d"),  # d is dangling (no out-edges)
]


def test_matches_python_spec(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        row["node"]: row["r_pico"]
        for row in pagerank(edges, iters=3).collect()
    }
    assert got == _py_pagerank(EDGES, iters=3)


def test_partitioning_invariance(spark):
    edges = spark.createDataFrame(EDGES * 3, "src string, dst string")
    a = pagerank(edges.repartition(1), iters=2).collect()
    b = pagerank(edges.repartition(7, "dst"), iters=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_mass_conservation_bounds(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    rows = pagerank(edges, iters=4).collect()
    total = sum(r["r_pico"] for r in rows)
    # floor leaks mass but never creates it
    assert 0 < total <= 10**12
    assert all(r["r_pico"] > 0 for r in rows)
    for r in rows:
        assert r["rank"] == pytest.approx(r["r_pico"] / 1e12, abs=0)


def test_duckdb_oracle_parity(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
    )
    got = sorted(
        (r["node"], r["r_pico"], r["rank"])
        for r in pagerank(edges, iters=3).collect()
    )
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    sql = pagerank_oracle_sql(
        "SELECT 'C' || CAST(o_custkey AS VARCHAR) AS src, "
        "'S' || CAST(l_suppkey AS VARCHAR) AS dst "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey",
        iters=3,
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_empty_and_validation(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty, iters=2).count() == 0
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError, match="damping"):
        pagerank(edges, damping=(0, 100))
    with pytest.raises(ValueError, match="2\\^62"):
        pagerank(edges, total=10**18)
    with pytest.raises(ValueError, match="iters"):
        pagerank(edges, iters=-1)


def test_domain_edges_and_recipe(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://blog.example.org/p1",
             "see https://Ref.NET/x and http://other.com"),
            (2, "ref.net", "points home https://ref.net/self and "
             "to https://blog.example.org/a"),
            (3, "lonely.io", "no links here"),
            (4, None, "https://ref.net/ignored null src"),
        ],
        "doc_id long, url string, text string",
    )
    edges = sorted(
        map(tuple, domain_link_edges(docs, "url", "text").collect())
    )
    # doc2's self-link dropped; doc3 contributes nothing; doc4 null src
    assert edges == [
        ("blog.example.org", "other.com"),
        ("blog.example.org", "ref.net"),
        ("ref.net", "blog.example.org"),
    ]
    recipe = sorted(
        map(tuple, domain_pagerank(docs, "url", iters=2).collect())
    )
    direct = sorted(
        map(
            tuple,
            pagerank(
                domain_link_edges(docs, "url", "text"), iters=2
            ).collect(),
        )
    )
    assert recipe == direct


# --- HITS ---------------------------------------------------------------


def _py_hits(edges, iters, total=10**9):
    """Independent pure-python reference of the documented L1 HITS
    integer spec."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {t for _, t in e})
    n = len(nodes)
    h = {v: total // n for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(iters):
        ar = {v: 0 for v in nodes}
        for s, t in e:
            ar[t] += h[s]
        sa = sum(ar.values())
        a = {
            v: (ar[v] * total) // sa if sa > 0 else 0 for v in nodes
        }
        hr = {v: 0 for v in nodes}
        for s, t in e:
            hr[s] += a[t]
        sh = sum(hr.values())
        h = {
            v: (hr[v] * total) // sh if sh > 0 else 0 for v in nodes
        }
    return a, h


def test_hits_matches_python_spec(spark):
    from quality_spark.operators.graphrank import hits

    edges = spark.createDataFrame(EDGES, "src string, dst string")
    rows = hits(edges, iters=3).collect()
    a, h = _py_hits(EDGES, iters=3)
    assert {r["node"]: r["authority_nano"] for r in rows} == a
    assert {r["node"]: r["hub_nano"] for r in rows} == h
    # d has no out-edges: pure authority, zero hub; a links out only
    got = {r["node"]: r for r in rows}
    assert got["d"]["hub_nano"] == 0
    assert got["d"]["authority_nano"] > 0
    assert got["a"]["hub_nano"] > 0


def test_hits_duckdb_parity_and_invariance(spark, sf_dir):
    from quality_spark.operators.graphrank import hits, hits_oracle_sql

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = orders.join(
        lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
    ).select(
        F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    got = sorted(map(tuple, hits(edges, iters=2).collect()))
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    want = sorted(
        map(
            tuple,
            con.execute(
                hits_oracle_sql(
                    "SELECT 'C' || CAST(o_custkey AS VARCHAR) AS src, "
                    "'S' || CAST(l_suppkey AS VARCHAR) AS dst "
                    "FROM orders JOIN lineitem "
                    "ON o_orderkey = l_orderkey",
                    iters=2,
                )
            ).fetchall(),
        )
    )
    assert got == want
    b = sorted(
        map(tuple, hits(edges.repartition(13, "src"), iters=2).collect())
    )
    assert got == b


def test_hits_validation(spark):
    import pytest

    from quality_spark.operators.graphrank import hits

    edges = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError, match="2\\^63"):
        hits(edges, total=10**10)
    with pytest.raises(ValueError, match="iters"):
        hits(edges, iters=-2)
    empty = spark.createDataFrame([], "src string, dst string")
    assert hits(empty, iters=1).count() == 0
