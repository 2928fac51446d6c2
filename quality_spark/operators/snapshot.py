"""Row-level snapshot diff: the monitoring loop's finest granularity.

``profile_drift`` / ``profile_psi`` (operators/profile.py) answer "did
the DISTRIBUTION move"; :func:`snapshot_diff` answers "WHICH rows moved"
between two snapshots of a keyed table — added / removed / changed rows
plus exactly which columns changed per row. The typical loop: PSI flags
a column, snapshot_diff pinpoints the rows to quarantine or replay.

Semantics (both engines, bit-identical):

- keys join NULL-SAFELY (Spark ``<=>`` / DuckDB ``IS NOT DISTINCT
  FROM``), so a NULL key is a value that matches itself — a keyed
  snapshot with NULL keys diffs deterministically instead of
  cross-producting nothing;
- a column "changed" iff old IS DISTINCT FROM new (NULL→value,
  value→NULL and value→value' all count; NULL→NULL does not);
- ``changed_cols`` lists changed columns in the caller's declared
  ``compare_cols`` order (a deterministic order both engines render
  identically) and is EMPTY for added/removed rows — presence change
  is the ``change`` label's job;
- rows equal on every compare column are dropped unless
  ``include_unchanged=True``.

Keys must be unique per snapshot (a diff between multisets is not
well-defined row-wise); ``check_unique=True`` spends one aggregate per
side to enforce it with a clear error instead of silent join
multiplication.

100 TB shape: ONE full-outer shuffle join on the key columns — the
minimal movement for any row diff — with every comparison a codegen'd
null-safe equality; no UDFs, no window, no driver data. The summary
(:func:`snapshot_diff_counts`) adds one explode + one combinable
groupBy over the (already small) diff rows.

Reference scope note: the reference engine has no snapshot operators —
beyond-reference monitoring surface, same charter as profile drift.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "snapshot_diff",
    "snapshot_diff_counts",
    "snapshot_diff_oracle_sql",
    "snapshot_diff_counts_oracle_sql",
]


def _resolve_compare(old: DataFrame, new: DataFrame, keys, compare_cols):
    if not keys:
        raise ValueError("keys must be non-empty")
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c not in keys and c in new.columns
        ]
    if not compare_cols:
        raise ValueError(
            "no compare columns: snapshots share no non-key columns"
        )
    missing = [
        c
        for c in list(keys) + list(compare_cols)
        if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(f"columns missing from a snapshot: {missing}")
    return list(compare_cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
    include_unchanged: bool = False,
    check_unique: bool = False,
) -> DataFrame:
    """(keys…, change, changed_cols) — one row per key whose presence
    or compared value differs between ``old`` and ``new``.

    ``change`` ∈ {'added', 'removed', 'changed'} (plus 'unchanged'
    when ``include_unchanged``); ``changed_cols`` is an
    ``array<string>`` in ``compare_cols`` order, empty unless
    ``change = 'changed'``."""
    keys = list(keys)
    compare_cols = _resolve_compare(old, new, keys, compare_cols)
    if check_unique:
        for side, df in (("old", old), ("new", new)):
            dup = (
                df.groupBy(*keys)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"{side} snapshot has duplicate keys "
                    f"(e.g. {tuple(dup[0][k] for k in keys)}) — "
                    "snapshot_diff requires unique keys per snapshot"
                )

    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__op"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__np"),
    )
    cond = None
    for k in keys:
        this = o[f"__ko_{k}"].eqNullSafe(n[f"__kn_{k}"])
        cond = this if cond is None else (cond & this)
    j = o.join(n, cond, "full_outer")

    changed_arr = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                    F.lit(c),
                )
                for c in compare_cols
            ]
        )
    )
    change = (
        F.when(F.col("__np").isNull(), F.lit("removed"))
        .when(F.col("__op").isNull(), F.lit("added"))
        .when(F.size("__changed") > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = (
        j.withColumn("__changed", changed_arr)
        .select(
            *[
                F.coalesce(F.col(f"__ko_{k}"), F.col(f"__kn_{k}")).alias(k)
                for k in keys
            ],
            change.alias("change"),
            F.when(
                F.col("__op").isNull() | F.col("__np").isNull(),
                F.array().cast("array<string>"),
            )
            .otherwise(F.col("__changed"))
            .alias("changed_cols"),
        )
    )
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out


def snapshot_diff_counts(diff: DataFrame) -> DataFrame:
    """(metric, n) summary of a :func:`snapshot_diff` frame: one row
    per change kind plus one ``col:<name>`` row per compared column
    counting the rows where it changed. One union of two combinable
    groupBys — diff frames are change-sized, not snapshot-sized."""
    kinds = diff.groupBy(F.col("change").alias("metric")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    cols = (
        diff.select(F.explode("changed_cols").alias("c"))
        .groupBy(F.concat(F.lit("col:"), F.col("c")).alias("metric"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return kinds.unionByName(cols)


def _duck_diff_core(
    old_sql: str,
    new_sql: str,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    include_unchanged: bool,
) -> str:
    keys = list(keys)
    on = " AND ".join(
        f"o.{k} IS NOT DISTINCT FROM n.{k}" for k in keys
    )
    key_out = ", ".join(f"coalesce(o.{k}, n.{k}) AS {k}" for k in keys)
    items = ", ".join(
        f"CASE WHEN o.{c} IS DISTINCT FROM n.{c} THEN '{c}' END"
        for c in compare_cols
    )
    changed = f"list_filter([{items}], x -> x IS NOT NULL)"
    change = (
        "CASE WHEN n.__np IS NULL THEN 'removed' "
        "WHEN o.__op IS NULL THEN 'added' "
        f"WHEN len({changed}) > 0 THEN 'changed' "
        "ELSE 'unchanged' END"
    )
    where = "" if include_unchanged else "WHERE change != 'unchanged'"
    return f"""
SELECT * FROM (
  SELECT {key_out},
         {change} AS change,
         CASE WHEN o.__op IS NULL OR n.__np IS NULL
              THEN CAST([] AS VARCHAR[]) ELSE {changed} END AS changed_cols
  FROM (SELECT *, 1 AS __op FROM ({old_sql})) o
  FULL OUTER JOIN (SELECT *, 1 AS __np FROM ({new_sql})) n ON {on}
) {where}
"""


def snapshot_diff_oracle_sql(
    old_sql: str,
    new_sql: str,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    include_unchanged: bool = False,
) -> str:
    """DuckDB twin of :func:`snapshot_diff` over any two relations."""
    return _duck_diff_core(
        old_sql, new_sql, keys, compare_cols, include_unchanged
    )


def snapshot_diff_counts_oracle_sql(
    old_sql: str,
    new_sql: str,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> str:
    """DuckDB twin of :func:`snapshot_diff_counts` over the diff of
    two relations."""
    core = _duck_diff_core(old_sql, new_sql, keys, compare_cols, False)
    return f"""
WITH d AS MATERIALIZED ({core})
SELECT change AS metric, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1
UNION ALL
SELECT 'col:' || u.c, CAST(count(*) AS BIGINT)
FROM d, LATERAL unnest(d.changed_cols) AS u(c)
GROUP BY 1
"""
