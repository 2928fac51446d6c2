"""Relational profiling — cross-column and cross-table DQ facts.

Column profiles (`operators/profile.py`) describe one column at a
time; the rules people actually need next are RELATIONAL: is this key
unique, does every child row resolve to a parent, does column A
functionally determine column B. This module computes those facts as
single-aggregate DataFrame jobs, each with a DuckDB twin for the
oracle, closing the same authoring loop `suggest_rules` does for
per-column stats.

All outputs are metadata-sized (one row per checked relation) and all
arithmetic is integer counts — nothing here can diverge between
engines.

100 TB shapes:
- ``key_uniqueness``: one map-side-combinable groupBy on the key.
- ``fk_orphan_stats``: LEFT ANTI join child→parent — broadcast when
  the parent is a dimension (the common case), shuffle-hash otherwise;
  the output is two counts.
- ``fd_violations``: one groupBy(lhs) with two aggregates
  (count + count(DISTINCT rhs) — a single column's distinct per group,
  so Spark's Expand rewrite is not in play).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_uniqueness(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """(n_rows, n_keys, n_dup_keys, n_rows_in_dup_keys) for a
    candidate key: ``n_dup_keys`` = key values appearing more than
    once, ``n_rows_in_dup_keys`` = rows carrying them. Key columns
    with NULLs count as ordinary values (groupBy semantics) — a NULL
    key that repeats is still a uniqueness violation worth seeing."""
    if not keys:
        raise ValueError("keys must be non-empty")
    per = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__c"))
    return per.agg(
        F.sum("__c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.when(F.col("__c") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup_keys"),
        F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_in_dup_keys"),
    )


def key_uniqueness_oracle_sql(table: str, keys: Sequence[str]) -> str:
    ks = ", ".join(keys)
    return f"""
SELECT CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_keys,
       CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
         AS n_rows_in_dup_keys
FROM (SELECT {ks}, count(*) AS c FROM {table} GROUP BY {ks})
"""


def fk_orphan_stats(
    child: DataFrame,
    parent: DataFrame,
    child_keys: Sequence[str],
    parent_keys: Sequence[str],
    broadcast_parent: bool = True,
) -> DataFrame:
    """(n_child_rows, n_orphans, n_null_keys): ``n_orphans`` = child
    rows whose (non-null) key tuple matches no parent row — the
    referential-integrity fact an `exists`-style DQ rule asserts.
    Rows with any NULL key component are counted separately
    (``n_null_keys``) and NOT as orphans — SQL join semantics would
    never match them, but "missing FK" and "dangling FK" are
    different data problems.

    ``broadcast_parent=True`` (default) fits the common
    fact→dimension case; pass False for fact→fact integrity so the
    anti-join plans as a shuffle join on the keys."""
    if not child_keys or not parent_keys:
        raise ValueError("child_keys/parent_keys must be non-empty")
    if len(child_keys) != len(parent_keys):
        raise ValueError("child_keys and parent_keys must align")
    null_any = None
    for c in child_keys:
        cond = F.col(c).isNull()
        null_any = cond if null_any is None else (null_any | cond)
    non_null = child.filter(~null_any)
    pk = parent.select(
        *[F.col(p).alias(c) for c, p in zip(child_keys, parent_keys)]
    ).dropDuplicates(list(child_keys))
    if broadcast_parent:
        pk = F.broadcast(pk)
    orphans = non_null.join(pk, list(child_keys), "left_anti")
    n_child = child.count()
    n_null = child.filter(null_any).count()
    n_orph = orphans.count()
    spark = child.sparkSession
    return spark.createDataFrame(
        [(int(n_child), int(n_orph), int(n_null))],
        "n_child_rows bigint, n_orphans bigint, n_null_keys bigint",
    )


def fk_orphan_stats_oracle_sql(
    child_table: str,
    parent_table: str,
    child_keys: Sequence[str],
    parent_keys: Sequence[str],
) -> str:
    null_any = " OR ".join(f"c.{k} IS NULL" for k in child_keys)
    on = " AND ".join(
        f"c.{ck} = p.{pk}" for ck, pk in zip(child_keys, parent_keys)
    )
    return f"""
SELECT (SELECT CAST(count(*) AS BIGINT) FROM {child_table} c)
         AS n_child_rows,
       (SELECT CAST(count(*) AS BIGINT) FROM {child_table} c
        WHERE NOT ({null_any})
          AND NOT EXISTS (SELECT 1 FROM {parent_table} p WHERE {on}))
         AS n_orphans,
       (SELECT CAST(count(*) AS BIGINT) FROM {child_table} c
        WHERE {null_any}) AS n_null_keys
"""


def fd_violations(
    df: DataFrame, lhs: Sequence[str], rhs: str
) -> DataFrame:
    """(n_groups, n_violating_groups, n_rows_in_violations) for the
    functional dependency lhs → rhs: a group violates when its rows
    carry more than one distinct (non-null) rhs value. The discovery
    query behind "order key determines customer"-style consistency
    rules."""
    if not lhs:
        raise ValueError("lhs must be non-empty")
    per = df.groupBy(*lhs).agg(
        F.count(F.lit(1)).alias("__c"),
        F.countDistinct(rhs).alias("__d"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("__d") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating_groups"),
        F.sum(F.when(F.col("__d") > 1, F.col("__c")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_in_violations"),
    )


def fd_violations_oracle_sql(
    table: str, lhs: Sequence[str], rhs: str
) -> str:
    ls = ", ".join(lhs)
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(sum(CASE WHEN d > 1 THEN c ELSE 0 END) AS BIGINT)
         AS n_rows_in_violations
FROM (SELECT {ls}, count(*) AS c, count(DISTINCT {rhs}) AS d
      FROM {table} GROUP BY {ls})
"""


def relational_profile(
    facts: List[tuple],
) -> DataFrame:
    """Convenience packer: list of ('name', single-row DataFrame) →
    long (relation, stat, value) frame for reporting/gating."""
    if not facts:
        raise ValueError("facts must be non-empty")
    rows = []
    spark = None
    for name, frame in facts:
        spark = spark or frame.sparkSession
        row = frame.collect()[0]
        for k in frame.columns:
            v = row[k]
            rows.append((name, k, None if v is None else int(v)))
    return spark.createDataFrame(
        rows, "relation string, stat string, value bigint"
    )
