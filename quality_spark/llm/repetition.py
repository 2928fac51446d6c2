"""Gopher-style repetition filters for training-data curation.

Implements the repetition signals from the public Gopher analysis
(Rae et al. 2021, "Scaling Language Models", table A1) and C4-style
cleanup: duplicate-word/line fractions and most-frequent-n-gram
coverage, used to drop machine-generated or boilerplate-heavy
documents before training.

Per-document ratios are pure JVM Column expressions (split /
transform / aggregate) — whole-stage-codegen'd, streaming-safe, no
Python on the data path. Top-n-gram coverage needs per-(doc, gram)
counts, so it is a two-stage aggregation: ``groupBy(doc, gram)`` with
map-side partial counts, then an argmax ``max(struct(cnt, gram))`` per
doc — two keyed shuffles, no window sort, scale-safe at any corpus
size. Every signal has a DuckDB twin generated from the same spec for
the correctness oracle.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_sql


def _sum_lengths(arr: str, dialect: str) -> str:
    """Total characters across an array of strings (0 for empty)."""
    if dialect == "spark":
        return f"aggregate({arr}, 0, (a, x) -> a + length(x))"
    return f"coalesce(CAST(list_sum(list_transform({arr}, x -> length(x))) AS INT), 0)"


def _lines_sql(text: str, dialect: str) -> str:
    if dialect == "spark":
        return f"filter(split({text}, '\\n'), l -> l != '')"
    return f"list_filter(string_split({text}, chr(10)), l -> l != '')"


def repetition_sqls(
    text: str, dialect: str, toks_override: str = None
) -> Dict[str, str]:
    """Column-name → SQL for the repetition block ('spark'|'duckdb');
    arithmetic is identical so the oracle matches bit-for-bit.
    ``toks_override`` substitutes a pre-materialized token array column
    for the inlined tokenizer (fast-path staging)."""
    toks = toks_override or tokens_sql(text, dialect)
    lines = _lines_sql(text, dialect)
    size_fn = "size" if dialect == "spark" else "len"
    distinct_fn = "array_distinct" if dialect == "spark" else "list_distinct"

    wc = f"{size_fn}({toks})"
    dwc = f"{size_fn}({distinct_fn}({toks}))"
    wchars = _sum_lengths(toks, dialect)
    dwchars = _sum_lengths(f"{distinct_fn}({toks})", dialect)
    lc = f"{size_fn}({lines})"
    dlc = f"{size_fn}({distinct_fn}({lines}))"

    # nullif: empty docs divide by zero, which aborts under Spark 4
    # ANSI mode — NULL ratio on both sides instead
    return {
        "word_count": f"CAST({wc} AS INT)",
        "dup_word_fraction": (
            f"(CAST({wc} - {dwc} AS DOUBLE) / nullif(CAST({wc} AS DOUBLE), 0.0))"
        ),
        "dup_word_char_fraction": (
            f"(CAST({wchars} - {dwchars} AS DOUBLE) "
            f"/ nullif(CAST({wchars} AS DOUBLE), 0.0))"
        ),
        "dup_line_fraction": (
            f"(CAST({lc} - {dlc} AS DOUBLE) / nullif(CAST({lc} AS DOUBLE), 0.0))"
        ),
    }


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition ratios as extra columns."""
    sqls = repetition_sqls(text_col, "spark")
    return df.select("*", *[F.expr(s).alias(n) for n, s in sqls.items()])


def ngrams_all_sql(text: str, n: int, dialect: str) -> str:
    """ALL word n-grams (with multiplicity — counts matter here, unlike
    the dedup shingles which are distinct sets)."""
    toks = tokens_sql(text, dialect)
    if dialect == "spark":
        return (
            f"transform(sequence(1, greatest(size({toks}) - {n - 1}, 1)), "
            f"i -> array_join(slice({toks}, i, {n}), ' '))"
        )
    return (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))"
    )


def ngrams_all_from_tokens_sql(toks_col: str, n: int) -> str:
    """Spark n-grams over an already-materialized token-array COLUMN —
    the fast two-step form (see dedup.shingles_from_tokens_sql: an
    inlined tokenizer re-splits the text once PER n-gram position
    inside the transform lambda; measured 4.1s -> 0.5s at sf0.1)."""
    return (
        f"transform(sequence(1, greatest(size({toks_col}) - {n - 1}, 1)), "
        f"i -> array_join(slice({toks_col}, i, {n}), ' '))"
    )


def top_ngram_coverage(
    df: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Most-frequent word n-gram per document and the fraction of the
    document's characters it covers (count × gram length / doc chars) —
    the Gopher "top n-gram character fraction" filter signal.

    Plan shape: explode → groupBy(id, gram) count (map-side combine
    soaks up the within-doc duplication) → groupBy(id)
    ``max(struct(cnt, gram))`` argmax (tie-break: lexicographically
    LARGEST gram, mirrored in the oracle). Two hash shuffles keyed by
    (id, gram) then id; no window sort, no skew beyond per-doc gram
    cardinality.
    """
    from .dedup import tokens_sql as _tok

    grams = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("_doc_chars"),
        F.expr(_tok(text_col, "spark")).alias("_toks"),
    ).select(
        id_col,
        "_doc_chars",
        F.explode(F.expr(ngrams_all_from_tokens_sql("_toks", n))).alias("gram"),
    )
    counts = grams.groupBy(id_col, "gram").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.first("_doc_chars").alias("_doc_chars"),
    )
    top = counts.groupBy(id_col).agg(
        F.max(F.struct(F.col("cnt"), F.col("gram"))).alias("_top"),
        F.first("_doc_chars").alias("_doc_chars"),
    )
    return top.select(
        id_col,
        F.col("_top.gram").alias("top_gram"),
        F.col("_top.cnt").cast("bigint").alias("top_count"),
        (
            (F.col("_top.cnt") * F.length("_top.gram")).cast("double")
            / F.nullif(F.col("_doc_chars").cast("double"), F.lit(0.0))
        ).alias("top_coverage"),
    )


def top_ngram_oracle_sql(n: int, table: str = "documents", id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`top_ngram_coverage`."""
    grams = ngrams_all_sql("text", n, "duckdb")
    return f"""
WITH g AS (
  SELECT {id_col}, length(text) AS doc_chars, unnest({grams}) AS gram
  FROM {table}
), c AS (
  SELECT {id_col}, gram, doc_chars, count(*) AS cnt
  FROM g GROUP BY 1, 2, 3
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY {id_col} ORDER BY cnt DESC, gram DESC
  ) AS rn
  FROM c
)
SELECT {id_col}, gram AS top_gram, CAST(cnt AS BIGINT) AS top_count,
       CAST(cnt * length(gram) AS DOUBLE) / nullif(CAST(doc_chars AS DOUBLE), 0.0)
         AS top_coverage
FROM r WHERE rn = 1
"""
