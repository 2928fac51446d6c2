"""Skew-mitigation operators (operators/skew.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quality_spark.operators.skew import replicated_skew_join, salted_agg

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one key — the shape salting exists for."""
    return spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def test_salted_agg_equals_plain(spark, skewed):
    got = {
        (r["k"], r["n"], r["s"], r["mx"], round(r["a"], 9))
        for r in salted_agg(
            skewed,
            ["k"],
            {"n": ("count", "v"), "s": ("sum", "v"), "mx": ("max", "v"), "a": ("avg", "v")},
            salt_n=8,
        ).collect()
    }
    exp = {
        (r["k"], r["n"], r["s"], r["mx"], round(r["a"], 9))
        for r in skewed.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("s"),
            F.max("v").alias("mx"),
            F.avg("v").alias("a"),
        )
        .collect()
    }
    assert got == exp


def test_salted_agg_rejects_holistic(spark, skewed):
    with pytest.raises(ValueError, match="holistic"):
        salted_agg(skewed, ["k"], {"m": ("median", "v")})


def test_salted_agg_splits_identical_rows(spark):
    """The canonical hot group is IDENTICAL rows — a row-hash salt
    would collapse them into one bucket; the rand salt must not."""
    dup = spark.range(0, 2000).select(F.lit(1).alias("k"), F.lit(0.5).alias("v"))
    got = salted_agg(dup, ["k"], {"n": ("count", "v"), "s": ("sum", "v")}, salt_n=8)
    row = got.collect()[0]
    assert (row["k"], row["n"], row["s"]) == (1, 2000, 1000.0)
    n_buckets = (
        dup.select(F.floor(F.rand(87) * 8).cast("int").alias("s"))
        .distinct()
        .count()
    )
    assert n_buckets > 1


def test_replicated_skew_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [(1, "hot"), (17, "cold"), (99999, "absent")], "k long, name string"
    )
    got = sorted(
        (r["k"], r["v"], r["name"])
        for r in replicated_skew_join(skewed, dim, ["k"], salt_n=4).collect()
    )
    exp = sorted(
        (r["k"], r["v"], r["name"]) for r in skewed.join(dim, "k").collect()
    )
    assert got == exp


def test_replicated_skew_join_left(spark, skewed):
    dim = spark.createDataFrame([(1, "hot")], "k long, name string")
    out = replicated_skew_join(skewed, dim, ["k"], salt_n=4, how="left")
    assert out.count() == skewed.count()
    assert out.filter(F.col("name").isNull()).count() == skewed.filter(
        F.col("k") != 1
    ).count()
