"""Bucketed file-backed bloom: build, probe, persist, reload."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from quality_spark.sources.bigbloom import (
    big_bloom_from,
    load_big_bloom,
    register_big_bloom,
)
from quality_spark.sources.lookups import probability_in


@pytest.fixture(scope="module")
def bloom_dir():
    d = tempfile.mkdtemp(prefix="qs_bigbloom_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_big_bloom_membership(spark, sf_dir, bloom_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    bb = big_bloom_from(orders, "o_orderkey", expected=n, root_dir=bloom_dir, buckets=4)
    register_big_bloom(spark, "orders_bb", bb)

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # every lineitem orderkey exists in orders -> all probes hit
    hits = li.select(probability_in(F.col("l_orderkey"), "orders_bb").alias("p"))
    assert hits.filter(F.col("p") <= 0.0).count() == 0

    # keys far outside the range: overwhelmingly 0.0 (<= fpp false hits)
    probe_n = 2000
    absent = spark.range(10_000_000, 10_000_000 + probe_n).select(
        probability_in(F.col("id"), "orders_bb").alias("p")
    )
    false_hits = absent.filter(F.col("p") > 0.0).count()
    assert false_hits <= probe_n * 0.05, false_hits

    # bucket files exist
    assert sorted(f for f in os.listdir(bloom_dir) if f.startswith("bucket_")) == [
        f"bucket_{i}.npy" for i in range(4)
    ]


def test_big_bloom_reload(spark, sf_dir, bloom_dir):
    bb = load_big_bloom(bloom_dir)
    register_big_bloom(spark, "orders_bb2", bb)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(100)
    hits = orders.select(probability_in(F.col("o_orderkey"), "orders_bb2").alias("p"))
    assert hits.filter(F.col("p") <= 0.0).count() == 0


def test_big_bloom_sql_text_usage(spark, sf_dir, bloom_dir):
    """probability_in works inside rule text (SQL string) too."""
    from quality_spark.sources.lookups import probability_in_sql

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(500)
    sql = probability_in_sql("l_orderkey", "orders_bb")
    out = li.select(F.expr(sql).alias("p"))
    assert out.filter(F.col("p") <= 0.0).count() == 0
