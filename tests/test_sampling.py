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


# ---------------------------------------------------------------------------
# document filter pipeline (llm/pipeline.py)
# ---------------------------------------------------------------------------


def test_filter_pipeline_first_fail_wins_and_survivor_dedup(spark, docs):
    from quality_spark.llm.pipeline import filter_documents, filter_summary, kept_documents

    filtered = filter_documents(
        docs,
        min_tokens=30,
        min_quality=0.40,
        langs=["en", "fr", "de", "es"],
        dedup_key=F.substring("text", 1, 40),
    )
    rows = filtered.collect()
    # stage order: a too-short zh doc reports too_short, not lang
    by_id = {r["doc_id"]: r for r in rows}
    for r in rows:
        if r["drop_reason"] == "lang":
            assert r["lang"] not in ("en", "fr", "de", "es")
    # survivor-aware dedup: every duplicate has a kept row with the
    # same 40-char prefix and a smaller doc_id
    kept_pfx = {
        r["text"][:40]: r["doc_id"] for r in rows if r["drop_reason"] is None
    }
    for r in rows:
        if r["drop_reason"] == "duplicate":
            assert r["text"][:40] in kept_pfx
            assert kept_pfx[r["text"][:40]] < r["doc_id"]
    # accounting adds up
    total = filter_summary(filtered).agg(F.sum("n")).collect()[0][0]
    assert total == docs.count()
    assert kept_documents(filtered).count() == sum(
        1 for r in rows if r["drop_reason"] is None
    )


def test_filter_pipeline_stages_disable(spark, docs):
    from quality_spark.llm.pipeline import filter_documents

    out = filter_documents(docs, min_tokens=None, dedup_key=F.col("doc_id"))
    # only dedup active, keys unique -> everything kept
    assert out.filter(F.col("drop_reason").isNotNull()).count() == 0


def test_filter_pipeline_null_text_is_invalid(spark):
    from quality_spark.llm.pipeline import filter_documents

    df = spark.createDataFrame(
        [(1, "a real document " * 20, "en"), (2, None, "en"), (3, None, "en")],
        "doc_id long, text string, lang string",
    )
    rows = filter_documents(df, min_tokens=5).collect()
    reasons = {r["doc_id"]: r["drop_reason"] for r in rows}
    assert reasons[1] is None
    assert reasons[2] == "invalid" and reasons[3] == "invalid"


def test_text_stats_empty_doc_no_ansi_crash(spark):
    """Empty/whitespace/NULL text yields NULL ratios, not a
    DIVIDE_BY_ZERO abort under Spark 4's default ANSI mode."""
    from quality_spark.llm.textstats import with_text_stats

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "real text here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in with_text_stats(df).collect()}
    assert rows[1]["stopword_ratio"] is None
    assert rows[2]["avg_token_len"] is None
    assert rows[4]["token_count"] == 3


def test_hash_sample_complement_and_null_keys(spark):
    """complement=True partitions exactly; NULL keys land
    deterministically on one side instead of vanishing from both
    (code-review regression)."""
    from quality_spark.llm.sampling import hash_sample

    df = spark.createDataFrame(
        [(i,) for i in range(200)] + [(None,)], "k long"
    )
    train = hash_sample(df, 0.7, "k", seed=3)
    test = hash_sample(df, 0.7, "k", seed=3, complement=True)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == 201  # exact partition incl. the NULL row
    both = train.join(test, train["k"].eqNullSafe(test["k"]), "inner")
    assert both.count() == 0
    # rate=1.0 keeps EVERY row, NULL key included
    assert hash_sample(df, 1.0, "k").count() == 201
