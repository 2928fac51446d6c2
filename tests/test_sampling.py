"""Deterministic sampling / mixing (llm/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quality_spark.llm.sampling import (
    hash_sample,
    sample_cond_sql,
    stratified_hash_sample,
    weighted_mix,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_sample_deterministic_and_partition_invariant(spark, docs):
    a = {r["doc_id"] for r in hash_sample(docs, 0.5, "doc_id", seed=1).collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(7), 0.5, "doc_id", seed=1).collect()
    }
    assert a == b and 0.3 < len(a) / 500 < 0.7


def test_hash_sample_rate_zero_one(spark, docs):
    assert hash_sample(docs, 0.0, "doc_id").count() == 0
    assert hash_sample(docs, 1.0, "doc_id").count() == docs.count()
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5, "doc_id")


def test_different_seeds_differ(spark, docs):
    a = {r["doc_id"] for r in hash_sample(docs, 0.5, "doc_id", seed=1).collect()}
    b = {r["doc_id"] for r in hash_sample(docs, 0.5, "doc_id", seed=2).collect()}
    assert a != b


def test_stratified_rates(spark, docs):
    out = stratified_hash_sample(
        docs, {"en": 0.0, "fr": 1.0}, "lang", "doc_id", default_rate=0.0
    )
    rows = out.collect()
    assert all(r["lang"] == "fr" for r in rows)
    assert len(rows) == docs.filter(F.col("lang") == "fr").count()


def test_weighted_mix_tags_and_counts(spark, docs):
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    out = weighted_mix([("a", a, 1.0), ("b", b, 0.0)], "doc_id").collect()
    assert {r["mix_source"] for r in out} == {"a"}
    assert len(out) == a.count()


def test_sample_cond_dialects_agree(spark, docs):
    import duckdb

    cond_s = sample_cond_sql("doc_id", 0.37, 9, "spark")
    cond_d = sample_cond_sql("doc_id", 0.37, 9, "duckdb")
    got = {r["doc_id"] for r in docs.filter(F.expr(cond_s)).collect()}
    exp = {
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet' WHERE {cond_d}"
        ).fetchall()
    }
    assert got == exp
