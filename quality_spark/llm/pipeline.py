"""Composable document-filter pipeline: the canonical training-data
preprocessing pass (length / language / quality gates, then dedup among
survivors), with per-row drop accounting.

Semantics: stages evaluate in order and the FIRST failing stage names
the row's ``drop_reason`` (null = kept). Deduplication runs logically
last and only among rows that survived the scalar gates: the keeper of
a content group is its lowest-id surviving row; previously-dropped rows
keep their scalar reason rather than becoming "duplicate".

Scale shape: the scalar gates are one narrow projection (no shuffle);
dedup is a single window over the content key — one shuffle keyed by a
small hash, survivors-first ordering makes keeper choice survivor-aware
without a second pass.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import text_stats_sqls


def filter_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: Optional[int] = 30,
    max_punct_ratio: Optional[float] = None,
    min_quality: Optional[float] = None,
    langs: Optional[Sequence[str]] = None,
    lang_col: str = "lang",
    max_dup_word_fraction: Optional[float] = None,
    max_pii_total: Optional[int] = None,
    pii_patterns: Optional[Dict[str, str]] = None,
    blocked_domains: Optional[Sequence[str]] = None,
    dedup_key: Optional[Column] = None,
    reason_col: str = "drop_reason",
) -> DataFrame:
    """Adds ``drop_reason`` (null = kept). ``None`` thresholds disable
    their stage. ``dedup_key`` defaults to ``md5(text)`` (exact dedup);
    pass e.g. ``F.substring("text", 1, 40)`` for prefix fingerprints,
    or ``None``-returning expression columns for custom keys."""
    from .dedup import tokens_sql

    # tokens materialize ONCE in their own projection: the token-based
    # gates reference the array ~7 times between them, and an inlined
    # tokenizer re-splits the text per reference (the measured trap
    # documented at dedup.shingles_from_tokens_sql)
    toks_col = "__qs_pipe_toks"
    with_toks = df.select(
        "*", F.expr(tokens_sql(text_col, "spark")).alias(toks_col)
    )
    stats = text_stats_sqls(text_col, "spark", toks_override=toks_col)
    conds = []
    # NULL text first: NULL makes every threshold comparison NULL (never
    # firing), so without this stage NULL-text rows would sail through
    # the gates and then all share the NULL content key in dedup — one
    # arbitrary row kept, the rest mislabeled 'duplicate'
    conds.append((F.col(text_col).isNull(), "invalid"))
    if min_tokens is not None:
        conds.append((F.expr(stats["token_count"]) < min_tokens, "too_short"))
    if langs is not None:
        conds.append((~F.col(lang_col).isin(*langs), "lang"))
    if max_punct_ratio is not None:
        conds.append((F.expr(stats["punct_ratio"]) > max_punct_ratio, "punct"))
    if min_quality is not None:
        conds.append((F.expr(stats["quality_score"]) < min_quality, "quality"))
    if max_dup_word_fraction is not None:
        from .repetition import repetition_sqls

        rep = repetition_sqls(text_col, "spark", toks_override=toks_col)
        conds.append(
            (
                F.expr(rep["dup_word_fraction"]) > max_dup_word_fraction,
                "repetition",
            )
        )
    if max_pii_total is not None:
        from .pii import pii_total_col

        conds.append((pii_total_col(text_col, pii_patterns) > max_pii_total, "pii"))
    if blocked_domains:
        from .urls import blocked_domain_cond

        conds.append(
            (blocked_domain_cond(text_col, blocked_domains), "blocked_domain")
        )

    reason = F.lit(None).cast("string")
    for cond, name in reversed(conds):
        reason = F.when(cond, F.lit(name)).otherwise(reason)
    staged = with_toks.select("*", reason.alias(reason_col)).drop(toks_col)

    key = dedup_key if dedup_key is not None else F.md5(F.col(text_col))
    # survivors-first ordering: among rows sharing a content key, the
    # lowest-id SURVIVOR is rank 1 (the keeper); rows already dropped
    # sort after survivors so they never steal keeper-ship
    w = Window.partitionBy(key).orderBy(
        F.col(reason_col).isNotNull(), F.col(id_col)
    )
    ranked = staged.select("*", F.row_number().over(w).alias("__dup_rank"))
    final_reason = F.when(
        F.col(reason_col).isNull() & (F.col("__dup_rank") > 1), F.lit("duplicate")
    ).otherwise(F.col(reason_col))
    return ranked.select(
        *[c for c in staged.columns if c != reason_col],
        final_reason.alias(reason_col),
    )


def filter_summary(
    filtered: DataFrame, reason_col: str = "drop_reason"
) -> DataFrame:
    """(outcome, n) accounting: per-reason drop counts + 'kept'."""
    return (
        filtered.groupBy(
            F.coalesce(F.col(reason_col), F.lit("kept")).alias("outcome")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def kept_documents(
    filtered: DataFrame, reason_col: str = "drop_reason"
) -> DataFrame:
    return filtered.filter(F.col(reason_col).isNull()).drop(reason_col)


def corpus_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: Optional[str] = "lang",
    top_langs: int = 10,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """One-call corpus card — the first thing anyone asks of a new
    training corpus, as a single long-format frame
    (section, metric, key, value BIGINT; micro-scaled where noted):

    - ``volume``: n_docs, n_tokens, n_chars, n_empty (token-less docs)
    - ``length``: token-count quantiles (nearest-rank, micro-scaled)
      + mean_micros — via `operators/profile.py:profile_columns` on
      the staged token counts (its exact single-scan path)
    - ``lang``: top-``top_langs`` language counts
      (`operators/profile.py:profile_categorical` — NULL rankable)
    - ``dup``: exact-duplicate groups / surplus rows (md5 groupBy —
      `dedup.exact_dup_groups`' accounting)

    A COMPOSITION RECIPE, not a new operator: every section is an
    already-oracle-gated op, and the test pins each section equal to
    its standalone call. Scan budget: one tokenize pass (the staged
    count frame is what profile_columns scans), one lang groupBy, one
    md5 groupBy — three corpus scans total, each combinable."""
    from ..operators.profile import profile_categorical, profile_columns
    from .dedup import tokens_sql

    spark = df.sparkSession
    staged = df.select(
        F.col(id_col),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_key"),
        F.expr(f"size({tokens_sql(text_col, 'spark')})")
        .cast("bigint")
        .alias("n_tokens"),
        F.length(F.coalesce(F.col(text_col), F.lit("")))
        .cast("bigint")
        .alias("_chars"),
    ).localCheckpoint()

    vol = staged.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce(F.sum("_chars"), F.lit(0)).cast("bigint").alias("n_chars"),
        F.coalesce(
            F.sum(F.when(F.col("n_tokens") == 0, 1).otherwise(0)), F.lit(0)
        ).cast("bigint").alias("n_empty"),
    )
    vol_rows = vol.selectExpr(
        "stack(4, 'n_docs', n_docs, 'n_tokens', n_tokens, "
        "'n_chars', n_chars, 'n_empty', n_empty) AS (metric, value)"
    ).select(
        F.lit("volume").alias("section"),
        "metric",
        F.lit("").alias("key"),
        "value",
    )
    length_rows = (
        profile_columns(staged, ["n_tokens"], bins=0, quantiles=quantiles)
        .filter(
            F.col("stat").isin(
                ["mean", *[f"p{int(q * 100)}" for q in quantiles]]
            )
        )
        .select(
            F.lit("length").alias("section"),
            F.col("stat").alias("metric"),
            F.lit("").alias("key"),
            F.col("value"),
        )
    )
    dup = (
        staged.groupBy("_key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .groupBy()
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("c") > 1, 1).otherwise(0)), F.lit(0)
            ).cast("bigint").alias("dup_groups"),
            F.coalesce(
                F.sum(F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0)),
                F.lit(0),
            ).cast("bigint").alias("dup_surplus_rows"),
        )
        .selectExpr(
            "stack(2, 'dup_groups', dup_groups, "
            "'dup_surplus_rows', dup_surplus_rows) AS (metric, value)"
        )
        .select(
            F.lit("dup").alias("section"),
            "metric",
            F.lit("").alias("key"),
            "value",
        )
    )
    out = vol_rows.unionByName(length_rows).unionByName(dup)
    if lang_col is not None and lang_col in df.columns:
        lang_rows = profile_categorical(df, [lang_col], top=top_langs).select(
            F.lit("lang").alias("section"),
            F.lit("count").alias("metric"),
            F.coalesce(F.col("value"), F.lit("<NULL>")).alias("key"),
            F.col("cnt").alias("value"),
        )
        out = out.unionByName(lang_rows)
    return out
