"""Hashed linear text classifier scoring — the fastText-shaped quality
filter every big corpus pipeline runs (CCNet / RefinedWeb style:
score each document with a linear model over hashed word n-grams and
keep the high scorers).

What is implemented here is the SCORING mechanism at corpus scale —
the part that must be Spark-native and fast.  Training is out of
scope (no labeled data ships with this repo); the model is whatever
(bucket → weight) assignment the caller provides:

- ``weight_sql_fn`` — a procedural weight as SQL over the bucket id
  (used by the gate/tests as a deterministic stand-in, and usable for
  random-feature baselines).  The whole score is then ONE pure Column
  projection: tokenize → hash → weight → mean — fully inside
  whole-stage codegen, NO shuffle, streaming-safe.
- ``weight_table`` — a real trained model as a (bucket, weight)
  DataFrame. Scoring explodes tokens, hashes, broadcast-joins the
  weight table (a model with 2M buckets is ~30 MB — always
  broadcastable), and re-aggregates per document: exactly one shuffle
  keyed by doc id, partial aggregation map-side.

Features are unigrams + word bigrams (fastText's default wordNgrams=2
shape), hashed into ``buckets`` via the repo's portable 60-bit md5
hash (dedup.hash60_sql) so a DuckDB oracle replays scores EXACTLY:
same tokens, same hash, same ascending fold order — bit-equal doubles.

The exported score is the linear MARGIN (mean feature weight).  The
sigmoid is available via ``sigmoid_expr`` but deliberately kept out
of the oracle-gated surface: ``exp()`` may differ in the last ulp
between engines, while the margin is +,*,/ arithmetic that both
engines compute bit-identically.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash60_sql, tokens_sql

__all__ = [
    "ngram_features_sql",
    "margin_sql",
    "with_classifier_margin",
    "score_with_weight_table",
    "sigmoid_expr",
    "default_weight_sql",
]


def ngram_features_sql(text: str, dialect: str, toks_override: Optional[str] = None) -> str:
    """Unigram + bigram feature strings as one array expression.
    Bigrams join adjacent tokens with a space; docs under 2 tokens get
    unigrams only (empty-array guard differs per dialect: Spark's
    sequence(1, 0) is DESCENDING [1,0], DuckDB's range(1, 1) is
    empty)."""
    toks = toks_override or tokens_sql(text, dialect)
    if dialect == "spark":
        big = (
            f"CASE WHEN size({toks}) >= 2 THEN "
            f"transform(sequence(1, size({toks}) - 1), "
            f"i -> concat(element_at({toks}, i), ' ', element_at({toks}, i + 1))) "
            f"ELSE array() END"
        )
        return f"concat({toks}, {big})"
    big = (
        f"list_transform(range(1, len({toks})), "
        f"i -> concat({toks}[i], ' ', {toks}[i + 1]))"
    )
    return f"list_concat({toks}, {big})"


def default_weight_sql(bucket: str, dialect: str) -> str:
    """Deterministic stand-in weight in [-1, 1]: ((b % 2001) - 1000)
    / 1000. Integer-derived, so the double is exact in both engines.
    A real deployment passes a trained weight table instead."""
    return f"((CAST(({bucket}) % 2001 AS DOUBLE) - 1000.0) / 1000.0)"


def margin_sql(
    text: str,
    dialect: str,
    buckets: int = 1 << 20,
    weight_sql_fn: Optional[Callable[[str, str], str]] = None,
    toks_override: Optional[str] = None,
) -> str:
    """Mean hashed-feature weight as ONE projection expression
    (NULL for docs with no tokens — nullif guard, ANSI-safe)."""
    wfn = weight_sql_fn or default_weight_sql
    feats = ngram_features_sql(text, dialect, toks_override)
    bucket = f"({hash60_sql('f', dialect)} % {buckets})"
    w = wfn(bucket, dialect)
    if dialect == "spark":
        total = (
            f"aggregate(transform({feats}, f -> {w}), 0.0D, "
            f"(acc, v) -> acc + v)"
        )
        n = f"size({feats})"
    else:
        total = f"list_sum(list_transform({feats}, f -> {w}))"
        n = f"len({feats})"
    return f"(CAST({total} AS DOUBLE) / nullif(CAST({n} AS DOUBLE), 0.0))"


def _margin_arrow_udf(buckets: int):
    """Arrow twin of :func:`margin_sql` with the DEFAULT weight —
    BIT-IDENTICAL: tokens split on the Java-regex ``\\s+`` class
    (ASCII — Python's bare str.split would also eat unicode
    whitespace), features ordered unigrams-then-bigrams, md5 bucket
    per feature (C-speed hashlib vs the interpreted SQL HOF fold that
    measured 11 s at sf0.1), weights summed LEFT-TO-RIGHT in feature
    order so the double result equals the SQL fold exactly."""
    import hashlib
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ws = re.compile(r"\s+", re.ASCII)

    @pandas_udf("double")
    def margin(s):  # type: ignore[no-untyped-def]
        def one(x):
            if x is None:
                return None
            toks = [t for t in ws.split(x) if t]
            feats = toks + [
                f"{a} {b}" for a, b in zip(toks, toks[1:])
            ]
            if not feats:
                return None
            acc = 0.0
            for f in feats:
                b = int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % buckets
                acc += ((b % 2001) - 1000) / 1000.0
            return acc / float(len(feats))

        return s.map(one)

    return margin


def with_classifier_margin(
    df: DataFrame,
    text_col: str = "text",
    out: str = "clf_margin",
    buckets: int = 1 << 20,
    weight_sql_fn: Optional[Callable[[str, str], str]] = None,
    mode: str = "auto",
) -> DataFrame:
    """Procedural-weights scoring path — no shuffle either way.
    ``mode='sql'`` is the oracle-replayable pure Column projection
    (md5 inside a HOF fold — interpreted, so ~20× slower; it is the
    SPEC). ``mode='arrow'`` is the bit-identical fast twin (default
    via 'auto' when the weight function is the default; a custom
    ``weight_sql_fn`` forces 'sql' since arbitrary SQL weights have
    no Python twin)."""
    if mode == "auto":
        mode = "arrow" if weight_sql_fn is None else "sql"
    if mode == "arrow":
        if weight_sql_fn is not None:
            raise ValueError("mode='arrow' supports only the default weight")
        return df.withColumn(out, _margin_arrow_udf(buckets)(F.col(text_col)))
    return df.select(
        "*",
        F.expr(margin_sql(text_col, "spark", buckets, weight_sql_fn)).alias(out),
    )


def score_with_weight_table(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out: str = "clf_margin",
    buckets: int = 1 << 20,
) -> DataFrame:
    """Trained-model scoring path: ``weights`` is (bucket bigint,
    weight double). Explode features → hash → BROADCAST-join the
    model → one groupBy(id) mean (map-side partial agg). Unseen
    buckets weigh 0 (left join + coalesce), matching a sparse linear
    model. Returns (id_col, out)."""
    feats = df.select(
        F.col(id_col),
        F.explode(
            F.expr(ngram_features_sql(text_col, "spark"))
        ).alias("f"),
    ).select(
        id_col,
        F.expr(f"({hash60_sql('f', 'spark')} % {buckets})").alias("bucket"),
    )
    joined = feats.join(
        F.broadcast(weights.select("bucket", "weight")), "bucket", "left"
    )
    return joined.groupBy(id_col).agg(
        F.avg(F.coalesce(F.col("weight"), F.lit(0.0))).alias(out)
    )


def sigmoid_expr(margin: Column) -> Column:
    """1/(1+e^-x); library-side convenience — kept OUT of the gated
    surface (exp() last-ulp drift across engines)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
