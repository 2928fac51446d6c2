"""Relational profiling (`operators/relprofile.py`) — key uniqueness,
FK orphan stats, FD violations: known-value checks + DuckDB parity on
real testdata."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from quality_spark.operators.relprofile import (
    fd_violations,
    fd_violations_oracle_sql,
    fk_orphan_stats,
    fk_orphan_stats_oracle_sql,
    key_uniqueness,
    key_uniqueness_oracle_sql,
    relational_profile,
)


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_key_uniqueness_known_and_parity(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    con = _duck(sf_dir)
    # a key that truly holds in the testdata: documents.doc_id
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = key_uniqueness(docs, ["doc_id"]).collect()[0]
    assert got["n_dup_keys"] == 0
    assert got["n_rows"] == got["n_keys"] == docs.count()
    # lineitem keys duplicate (even the composite, in this synthetic
    # data — an honest DQ finding); DuckDB agrees on every count
    got2 = tuple(key_uniqueness(li, ["l_orderkey"]).collect()[0])
    want2 = con.execute(
        key_uniqueness_oracle_sql("lineitem", ["l_orderkey"])
    ).fetchone()
    assert got2 == tuple(want2)
    assert got2[2] > 0  # real duplicates at every sf


def test_key_uniqueness_null_keys_count(spark):
    df = spark.createDataFrame(
        [(None, 1), (None, 2), (1, 3), (1, 4), (2, 5)], "k int, v int"
    )
    got = key_uniqueness(df, ["k"]).collect()[0]
    # NULL repeats -> a duplicate key like any other
    assert got["n_keys"] == 3
    assert got["n_dup_keys"] == 2
    assert got["n_rows_in_dup_keys"] == 4


def test_fk_orphan_stats_engineered_and_parity(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li2 = li.withColumn(
        "l_orderkey",
        F.when(F.col("l_orderkey") % 997 == 0, None)
        .when(F.col("l_partkey") % 501 == 0, -F.col("l_orderkey"))
        .otherwise(F.col("l_orderkey")),
    )
    got = tuple(
        fk_orphan_stats(
            li2, orders, ["l_orderkey"], ["o_orderkey"]
        ).collect()[0]
    )
    con = _duck(sf_dir)
    li2_sql = (
        "(SELECT * REPLACE (CASE WHEN l_orderkey % 997 = 0 THEN NULL"
        " WHEN l_partkey % 501 = 0 THEN -l_orderkey"
        " ELSE l_orderkey END AS l_orderkey) FROM lineitem)"
    )
    want = con.execute(
        fk_orphan_stats_oracle_sql(
            li2_sql, "orders", ["l_orderkey"], ["o_orderkey"]
        )
    ).fetchone()
    assert got == tuple(want)
    assert got[1] > 0 and got[2] > 0  # engineered orphans + nulls
    # untouched child: zero orphans, zero null keys
    clean = fk_orphan_stats(
        li, orders, ["l_orderkey"], ["o_orderkey"]
    ).collect()[0]
    assert clean["n_orphans"] == 0 and clean["n_null_keys"] == 0


def test_fd_violations_both_shapes_and_packer(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    con = _duck(sf_dir)
    viol = tuple(
        fd_violations(orders, ["o_custkey"], "o_orderstatus").collect()[0]
    )
    want = con.execute(
        fd_violations_oracle_sql("orders", ["o_custkey"], "o_orderstatus")
    ).fetchone()
    assert viol == tuple(want)
    assert viol[1] > 0  # customers with mixed statuses exist
    holds = fd_violations(orders, ["o_orderkey"], "o_custkey").collect()[0]
    assert holds["n_violating_groups"] == 0
    packed = relational_profile(
        [
            ("holds", fd_violations(orders, ["o_orderkey"], "o_custkey")),
            ("viol", fd_violations(orders, ["o_custkey"], "o_orderstatus")),
        ]
    )
    rows = {(r["relation"], r["stat"]): r["value"] for r in packed.collect()}
    assert rows[("holds", "n_violating_groups")] == 0
    assert rows[("viol", "n_violating_groups")] == viol[1]


def test_relprofile_empty_inputs_raise(spark):
    """ADVICE r9: empty key lists / fact lists fail fast with a clear
    ValueError instead of crashing inside Spark."""
    import pytest

    from quality_spark.operators.relprofile import (
        fd_violations,
        fk_orphan_stats,
        key_uniqueness,
        relational_profile,
    )

    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="non-empty"):
        key_uniqueness(df, [])
    with pytest.raises(ValueError, match="non-empty"):
        fk_orphan_stats(df, df, [], [])
    with pytest.raises(ValueError, match="non-empty"):
        fd_violations(df, [], "b")
    with pytest.raises(ValueError, match="non-empty"):
        relational_profile([])


def test_join_explosion_known_values(spark):
    from quality_spark.operators.relprofile import (
        join_explosion_stats,
        join_hot_keys,
    )

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (None, "d"), (9, "e")],
        "k long, v string",
    )
    right = spark.createDataFrame(
        [(1, "x"), (1, "y"), (1, "z"), (2, "w"), (None, "n"), (7, "q")],
        "k long, v string",
    )
    got = join_explosion_stats(left, right, ["k"]).collect()[0]
    assert got["n_left_rows"] == 5 and got["n_right_rows"] == 6
    assert got["n_left_null_key_rows"] == 1
    assert got["n_right_null_key_rows"] == 1
    assert got["n_matching_keys"] == 2  # keys 1 and 2; 9/7 unmatched
    assert int(got["out_rows"]) == 2 * 3 + 1 * 1
    assert int(got["max_key_out"]) == 6
    # the exact inner-join cardinality IS the join's row count
    assert int(got["out_rows"]) == left.join(right, "k").count()
    hot = join_hot_keys(left, right, ["k"], k=1).collect()
    assert len(hot) == 1 and hot[0]["k"] == 1
    assert (hot[0]["cnt_left"], hot[0]["cnt_right"]) == (2, 3)
    # disjoint sides -> zero everywhere, not NULL
    none = join_explosion_stats(
        left.filter("k = 9"), right.filter("k = 7"), ["k"]
    ).collect()[0]
    assert int(none["out_rows"]) == 0 and int(none["max_key_out"]) == 0


def test_join_explosion_duckdb_parity(spark, sf_dir):
    from quality_spark.operators.relprofile import (
        join_explosion_stats,
        join_explosion_stats_oracle_sql,
        join_hot_keys,
        join_hot_keys_oracle_sql,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    con = _duck(sf_dir)
    got = join_explosion_stats(
        orders, li, ["o_orderkey"], ["l_orderkey"]
    ).collect()[0]
    want = con.execute(
        join_explosion_stats_oracle_sql(
            "orders", "lineitem", ["o_orderkey"], ["l_orderkey"]
        )
    ).fetchone()
    assert tuple(got) == tuple(want)
    hot = [
        tuple(r)
        for r in join_hot_keys(
            li, li, ["l_suppkey"], k=5
        ).collect()
    ]
    whot = con.execute(
        join_hot_keys_oracle_sql("lineitem", "lineitem", ["l_suppkey"], k=5)
    ).fetchall()
    assert hot == [tuple(w) for w in whot]


def test_join_explosion_validation(spark):
    from quality_spark.operators.relprofile import (
        join_explosion_stats,
        join_hot_keys,
    )

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        join_explosion_stats(df, df, [])
    with pytest.raises(ValueError, match="length"):
        join_explosion_stats(df, df, ["k"], ["k", "v"])
    with pytest.raises(ValueError, match="positive"):
        join_hot_keys(df, df, ["k"], k=0)


def test_k_anonymity_known_and_parity(spark, sf_dir):
    from quality_spark.operators.relprofile import (
        k_anonymity_oracle_sql,
        k_anonymity_stats,
    )

    df = spark.createDataFrame(
        [
            ("us", 30, "x"), ("us", 30, "y"), ("us", 30, "z"),
            ("eu", 40, "p"), ("eu", 40, "q"),
            ("ap", 50, "lone"),
            (None, None, "nulls"),
        ],
        "region string, age int, payload string",
    )
    got = k_anonymity_stats(df, ["region", "age"], k=2).collect()[0]
    assert tuple(got) == (7, 4, 1, 2, 2)  # (ap,50) and the NULL tuple
    got3 = k_anonymity_stats(df, ["region", "age"], k=3).collect()[0]
    assert got3["n_rows_below_k"] == 4 and got3["min_group_size"] == 1

    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        k_anonymity_stats(df, [], 2)
    with pytest.raises(ValueError, match=">= 1"):
        k_anonymity_stats(df, ["region"], 0)

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    con = _duck(sf_dir)
    g = k_anonymity_stats(
        orders, ["o_orderstatus", "o_orderpriority"], k=5
    ).collect()[0]
    w = con.execute(
        k_anonymity_oracle_sql(
            "orders", ["o_orderstatus", "o_orderpriority"], 5
        )
    ).fetchone()
    assert tuple(g) == tuple(w)
