"""Row-level snapshot diff (operators/snapshot.py): semantics on
engineered frames, NULL-key matching, uniqueness guard, and DuckDB
oracle parity on real testdata."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from quality_spark.operators.snapshot import (
    snapshot_diff,
    snapshot_diff_counts,
    snapshot_diff_counts_oracle_sql,
    snapshot_diff_oracle_sql,
)

SCHEMA = "k long, a string, b double"
OLD = [
    (1, "x", 1.0),   # unchanged
    (2, "y", 2.0),   # b changes
    (3, None, 3.0),  # a NULL -> value
    (4, "gone", 4.0),  # removed
    (None, "nk", 9.0),  # NULL key, a changes
]
NEW = [
    (1, "x", 1.0),
    (2, "y", 2.5),
    (3, "v", 3.0),
    (5, "new", 5.0),  # added
    (None, "nk2", 9.0),
]


def test_diff_semantics(spark):
    old = spark.createDataFrame(OLD, SCHEMA)
    new = spark.createDataFrame(NEW, SCHEMA)
    got = {
        r["k"]: (r["change"], r["changed_cols"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        2: ("changed", ["b"]),
        3: ("changed", ["a"]),
        4: ("removed", []),
        5: ("added", []),
        None: ("changed", ["a"]),  # NULL keys match null-safely
    }
    # include_unchanged keeps row 1
    all_rows = snapshot_diff(old, new, ["k"], include_unchanged=True)
    assert all_rows.count() == 6


def test_changed_cols_order_and_subset(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    new = spark.createDataFrame([(1, "b", 2.0)], SCHEMA)
    # declared order, not alphabetical
    r = snapshot_diff(old, new, ["k"], compare_cols=["b", "a"]).collect()[0]
    assert r["changed_cols"] == ["b", "a"]
    r = snapshot_diff(old, new, ["k"], compare_cols=["b"]).collect()[0]
    assert r["changed_cols"] == ["b"]


def test_counts_summary(spark):
    old = spark.createDataFrame(OLD, SCHEMA)
    new = spark.createDataFrame(NEW, SCHEMA)
    got = {
        r["metric"]: r["n"]
        for r in snapshot_diff_counts(
            snapshot_diff(old, new, ["k"])
        ).collect()
    }
    assert got == {
        "changed": 3,
        "removed": 1,
        "added": 1,
        "col:a": 2,
        "col:b": 1,
    }


def test_validation_and_uniqueness(spark):
    old = spark.createDataFrame(OLD, SCHEMA)
    new = spark.createDataFrame(NEW, SCHEMA)
    with pytest.raises(ValueError, match="keys must be non-empty"):
        snapshot_diff(old, new, [])
    with pytest.raises(ValueError, match="missing"):
        snapshot_diff(old, new, ["k"], compare_cols=["nope"])
    dup = spark.createDataFrame([(1, "x", 1.0), (1, "y", 2.0)], SCHEMA)
    with pytest.raises(ValueError, match="duplicate keys"):
        snapshot_diff(dup, new, ["k"], check_unique=True)
    # without the guard the join multiplies silently — documented
    assert snapshot_diff(dup, new, ["k"]).count() >= 1


_NEW_ORDERS_SPARK = (
    lambda o: o.filter(F.col("o_orderkey") % 11 != 3)
    .withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")),
    )
    .withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 13 == 5, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
)

_NEW_ORDERS_DUCK = """
SELECT * REPLACE (
  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
       ELSE o_totalprice END AS o_totalprice,
  CASE WHEN o_orderkey % 13 = 5 THEN 'X' ELSE o_orderstatus END
    AS o_orderstatus)
FROM orders WHERE o_orderkey % 11 != 3
"""

_CMP = ["o_orderstatus", "o_totalprice", "o_custkey"]


def test_duckdb_oracle_parity(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    diff = snapshot_diff(
        orders, _NEW_ORDERS_SPARK(orders), ["o_orderkey"], _CMP
    )
    got = sorted(
        (r["o_orderkey"], r["change"], tuple(r["changed_cols"]))
        for r in diff.collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    want = sorted(
        (k, c, tuple(cc))
        for k, c, cc in con.execute(
            snapshot_diff_oracle_sql(
                "SELECT * FROM orders", _NEW_ORDERS_DUCK,
                ["o_orderkey"], _CMP,
            )
        ).fetchall()
    )
    assert got == want and len(got) > 0
    gsum = sorted(
        map(tuple, snapshot_diff_counts(diff).collect())
    )
    wsum = sorted(
        map(
            tuple,
            con.execute(
                snapshot_diff_counts_oracle_sql(
                    "SELECT * FROM orders", _NEW_ORDERS_DUCK,
                    ["o_orderkey"], _CMP,
                )
            ).fetchall(),
        )
    )
    assert gsum == wsum
