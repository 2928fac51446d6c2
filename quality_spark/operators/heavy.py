"""Exact top-k heavy hitters with bounded memory — the "top domains /
top URLs / top tokens" pass every crawl-curation pipeline runs, built
so the full key cardinality NEVER shuffles.

The plain shape (``capacity=None``) is groupBy(key).count() + top-k
window: correct at any size, but its shuffle volume is the key
CARDINALITY (billions of distinct URLs at 100 TB). The bounded shape
(``capacity=m``) is the classic two-phase sketch-then-verify:

1. **Candidates** — one linear scan; each partition keeps a
   Misra-Gries summary of at most ``m`` counters (Misra & Gries 1982,
   "Finding repeated elements"; the weighted/merge form is the
   Metwally SpaceSaving family — public algorithms). MG guarantee:
   a key whose count in partition p exceeds N_p/(m+1) survives p's
   summary. By pigeonhole, any key with GLOBAL count > N/(m+1) must
   exceed N_p/(m+1) in at least one partition, so it appears among
   the <= m x P candidate keys.
2. **Exact recount** — one more scan, broadcast-semi-joined down to
   candidate rows, then a map-side-combined groupBy over <= m x P
   keys and the top-k window.

Result: EXACT counts and EXACT top-k whenever the true k-th count
exceeds N/(m+1) — the returned ``guarantee_threshold`` lets callers
verify that condition from the output itself (kth count >
threshold => provably complete). Shuffle volume is candidates, not
cardinality; driver traffic is the k output rows.

The reference engine has no frequent-items surface; beyond-reference
block (SURVEY §2)."""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_candidates(df: DataFrame, key_col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries candidate keys (<= capacity each),
    Arrow-batched: each batch folds via value_counts, then the
    weighted-MG merge (add counts; while over capacity, subtract the
    min count from all and drop the zeros).

    Nulls are filtered BEFORE the Arrow boundary, not inside pandas:
    a nullable bigint batch containing even one null reaches pandas
    as float64, silently rounding keys above 2^53 (64-bit hash keys
    at scale) — the rounded candidate then misses the exact recount
    join and a provably-heavy key vanishes from the result. Filtering
    first keeps the batch int64 (and pushes the IsNotNull to the
    scan)."""
    import pandas as pd

    keyed = df.select(F.col(key_col).alias("key")).filter(
        F.col("key").isNotNull()
    )
    schema = keyed.schema

    def summarize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in it:
            for val, cnt in pdf["key"].value_counts(dropna=True).items():
                counters[val] = counters.get(val, 0) + int(cnt)
                if len(counters) > capacity:
                    d = min(counters.values())
                    counters = {
                        k: v - d for k, v in counters.items() if v - d > 0
                    }
        yield pd.DataFrame({"key": list(counters.keys())})

    return keyed.mapInPandas(summarize, schema=schema)


def exact_topk_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    capacity: Optional[int] = None,
) -> DataFrame:
    """(``key_col``, cnt, rank, guarantee_threshold) — the k most
    frequent non-null keys, counts EXACT, ordered (cnt DESC, key ASC).

    ``capacity=None``: plain groupBy + window (shuffle = cardinality).
    ``capacity=m``: the bounded-memory two-phase shape (module doc) —
    identical output whenever the true k-th count > N/(m+1); compare
    the emitted ``cnt`` against ``guarantee_threshold`` to verify
    completeness from the result itself (pinned result-identical in
    tests and in the driver gate)."""
    from pyspark.sql import Window

    base = df.select(F.col(key_col)).filter(F.col(key_col).isNotNull())
    if capacity is None:
        counted = base.groupBy(key_col).agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        thresh = F.lit(None).cast("bigint")
    else:
        cand = _mg_candidates(df, key_col, int(capacity)).distinct()
        counted = (
            base.join(
                F.broadcast(cand.withColumnRenamed("key", key_col)), key_col
            )
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        total = base.groupBy().agg(
            F.count(F.lit(1)).cast("bigint").alias("_n")
        )
        thresh = F.expr(f"_n DIV {int(capacity) + 1}").cast("bigint")
        counted = counted.crossJoin(F.broadcast(total))
    # TakeOrdered (orderBy + limit), NOT a global row_number window:
    # the window would sort the whole counted table in ONE task; the
    # limit gathers k rows per partition and merges — rank is then a
    # window over the k survivors only (metadata).
    top = counted.orderBy(F.col("cnt").desc(), F.col(key_col)).limit(int(k))
    w = Window.orderBy(F.col("cnt").desc(), F.col(key_col))
    out = (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn("guarantee_threshold", thresh)
    )
    return out.select(key_col, "cnt", "rank", "guarantee_threshold")


def heavy_hitters_oracle_sql(
    table: str, key_col: str, k: int = 10, capacity: Optional[int] = None
) -> str:
    """DuckDB replay: exact top-k by (cnt DESC, key ASC) — the bounded
    shape is result-identical by the MG guarantee, so ONE oracle
    serves both (the gate runs the capacity shape against it)."""
    thresh = (
        "CAST(NULL AS BIGINT)"
        if capacity is None
        else f"CAST((SELECT count({key_col}) FROM {table}) // {int(capacity) + 1} AS BIGINT)"
    )
    return f"""
SELECT {key_col}, cnt, CAST(rnk AS INT) AS rank,
       {thresh} AS guarantee_threshold
FROM (
  SELECT {key_col}, CAST(count(*) AS BIGINT) AS cnt,
         row_number() OVER (ORDER BY count(*) DESC, {key_col}) AS rnk
  FROM {table} WHERE {key_col} IS NOT NULL
  GROUP BY {key_col}
) WHERE rnk <= {int(k)}
"""


def _mg_group_candidates(
    df: DataFrame, group_col: str, key_col: str, capacity: int
) -> DataFrame:
    """Per-partition, PER-GROUP Misra-Gries summaries: one independent
    m-counter sketch per group value seen in the partition, so the
    N_g/(m+1) guarantee holds per group (a shared counter pool would
    let a huge group evict another group's hitters)."""
    import pandas as pd

    # null filter BEFORE the Arrow boundary — same int64->float64
    # key-corruption hazard as _mg_candidates (see its docstring)
    keyed = df.select(
        F.col(group_col).alias("grp"), F.col(key_col).alias("key")
    ).filter(F.col("grp").isNotNull() & F.col("key").isNotNull())
    schema = keyed.schema

    def summarize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketches: dict = {}
        for pdf in it:
            sub = pdf.dropna(subset=["grp", "key"])
            for (g, val), cnt in (
                sub.groupby(["grp", "key"], sort=False).size().items()
            ):
                counters = sketches.setdefault(g, {})
                counters[val] = counters.get(val, 0) + int(cnt)
                if len(counters) > capacity:
                    d = min(counters.values())
                    sketches[g] = {
                        k: v - d for k, v in counters.items() if v - d > 0
                    }
        yield pd.DataFrame(
            {
                "grp": [g for g, c in sketches.items() for _ in c],
                "key": [k for c in sketches.values() for k in c],
            }
        )

    return keyed.mapInPandas(summarize, schema=schema)


def grouped_topk_heavy_hitters(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 10,
    capacity: Optional[int] = None,
) -> DataFrame:
    """(``group_col``, ``key_col``, cnt, rank, guarantee_threshold) —
    the k most frequent keys WITHIN each group ("top tokens per
    language"), counts exact, rank by (cnt DESC, key ASC) per group.

    ``capacity=m`` runs the bounded-memory shape with an independent
    MG sketch per group: exact whenever a group's true k-th count
    exceeds N_g/(m+1) (``guarantee_threshold`` is emitted PER GROUP).
    Shuffle volume: candidates (<= m x P x groups-per-partition), the
    per-group top-k window keys on the group (cardinality |groups|)."""
    from pyspark.sql import Window

    base = df.select(F.col(group_col), F.col(key_col)).filter(
        F.col(group_col).isNotNull() & F.col(key_col).isNotNull()
    )
    if capacity is None:
        counted = base.groupBy(group_col, key_col).agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        counted = counted.withColumn(
            "guarantee_threshold", F.lit(None).cast("bigint")
        )
    else:
        cand = _mg_group_candidates(
            df, group_col, key_col, int(capacity)
        ).distinct()
        counted = (
            base.join(
                F.broadcast(
                    cand.withColumnRenamed("grp", group_col)
                    .withColumnRenamed("key", key_col)
                ),
                [group_col, key_col],
            )
            .groupBy(group_col, key_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        totals = base.groupBy(group_col).agg(
            F.expr(f"count(1) DIV {int(capacity) + 1}")
            .cast("bigint")
            .alias("guarantee_threshold")
        )
        counted = counted.join(F.broadcast(totals), group_col)
    w = Window.partitionBy(group_col).orderBy(
        F.col("cnt").desc(), F.col(key_col)
    )
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= int(k))
        .select(group_col, key_col, "cnt", "rank", "guarantee_threshold")
    )


def grouped_heavy_hitters_oracle_sql(
    table: str,
    group_col: str,
    key_col: str,
    k: int = 10,
    capacity: Optional[int] = None,
) -> str:
    """DuckDB replay of :func:`grouped_topk_heavy_hitters` (the
    per-group threshold is the windowed sum of per-key counts —
    exactly N_g — integer-divided like the Spark DIV)."""
    return f"""
SELECT {group_col}, {key_col}, cnt, CAST(rnk AS INT) AS rank,
       guarantee_threshold
FROM (
  SELECT {group_col}, {key_col}, CAST(count(*) AS BIGINT) AS cnt,
         row_number() OVER (
           PARTITION BY {group_col} ORDER BY count(*) DESC, {key_col}
         ) AS rnk,
         {'CAST(NULL AS BIGINT)' if capacity is None else
          f'CAST(sum(count(*)) OVER (PARTITION BY {group_col}) // {int(capacity) + 1} AS BIGINT)'}
         AS guarantee_threshold
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {key_col} IS NOT NULL
  GROUP BY {group_col}, {key_col}
) WHERE rnk <= {int(k)}
"""
