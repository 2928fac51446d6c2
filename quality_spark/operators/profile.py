"""Column profiling — the data-quality companion to the rule engine.

A profile is how DQ rules get WRITTEN: before anyone can assert
``l_discount BETWEEN 0 AND 0.08`` they need the observed null rate,
range, moments, and distribution shape of every candidate column. The
reference engine stops at rule execution (its docs assume profiled
inputs); this module closes the loop as a beyond-reference extension
(SURVEY §2.9), in the same oracle-replayable style as the rest of the
repo.

Portability contract — INTEGER-EXACT everywhere: each value is first
scaled to micro units (``CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS
BIGINT)``, one IEEE multiply + floor, identical on every engine), and
every downstream statistic is integer/decimal arithmetic on those
micros:

- count / nulls / distinct: plain counts (distinct in MICRO space so
  both engines dedupe identical keys).
- min / max / sum / mean: BIGINT min/max, DECIMAL(38,0) sum (no
  overflow at any corpus size), mean = integer ``div``.
- stddev: the numerator ``n·Σx² − (Σx)²`` stays exact in
  DECIMAL(38,0); only the final ``floor(sqrt(num / (n·(n−1))))`` goes
  through double — sqrt is correctly rounded IEEE over an identical
  input, so the floored micro result matches bit-for-bit.
- histogram: fixed-width bins computed as
  ``(v − min) · bins div (max − min + 1)`` — pure integer arithmetic,
  so no float-boundary bin can ever disagree between engines.

100 TB design: the stats pass is ONE aggregate over all requested
columns together (map-side combined, a single scan regardless of how
many columns are profiled); the histogram pass is one more scan with
min/max inlined as literals (a groupBy on ``bins``-bounded keys).
Only the per-column stat rows — metadata, |cols| × ~8 values — are
ever collected.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: micro scaling: one double multiply + floor — byte-identical on any
#: IEEE engine, and every later stat is integer arithmetic on this
_MIC = "CAST(floor(CAST({c} AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"

STAT_NAMES = ("n", "n_null", "n_distinct", "min", "max", "sum", "mean", "std")


def _stat_exprs(c: str) -> List:
    mic = _MIC.format(c=c)
    ssum = f"CAST(sum(CAST({mic} AS DECIMAL(38,0))) AS DECIMAL(38,0))"
    ssq = (
        f"CAST(sum(CAST({mic} AS DECIMAL(38,0)) * CAST({mic} AS DECIMAL(38,0)))"
        f" AS DECIMAL(38,0))"
    )
    n = f"count({c})"
    # exact variance numerator; numerator and denominator cast to
    # DOUBLE separately, then ONE IEEE divide + sqrt + floor — every
    # step engine-identical (decimal division would round at an
    # engine-chosen result scale)
    std = (
        f"CASE WHEN {n} > 1 THEN CAST(floor(sqrt("
        f"CAST(({n} * {ssq}) - ({ssum} * {ssum}) AS DOUBLE) / "
        f"CAST({n} * ({n} - 1) AS DOUBLE)"
        f")) AS BIGINT) ELSE CAST(NULL AS BIGINT) END"
    )
    return [
        F.expr(n).alias(f"{c}__n"),
        F.expr(f"count(*) - count({c})").alias(f"{c}__n_null"),
        F.expr(f"count(DISTINCT {mic})").alias(f"{c}__n_distinct"),
        F.expr(f"min({mic})").alias(f"{c}__min"),
        F.expr(f"max({mic})").alias(f"{c}__max"),
        F.expr(f"CAST({ssum} AS BIGINT)").alias(f"{c}__sum"),
        F.expr(f"CAST({ssum} DIV {n} AS BIGINT)").alias(f"{c}__mean"),
        F.expr(std).alias(f"{c}__std"),
    ]


def profile_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(column, stat, value) — 8 integer stats per column from ONE
    aggregate scan (micro-scaled; see module doc). ``sum``/``mean``
    overflow-safe via DECIMAL(38,0) internals; the emitted values are
    BIGINT micros."""
    agg = df.groupBy().agg(*[e for c in cols for e in _stat_exprs(c)])
    stack_args = []
    for c in cols:
        for s in STAT_NAMES:
            stack_args.append(f"'{c}', '{s}', {c}__{s}")
    stacked = agg.select(
        F.expr(
            f"stack({len(cols) * len(STAT_NAMES)}, {', '.join(stack_args)}) "
            f"AS (column, stat, value)"
        )
    )
    return stacked


def profile_histogram(
    df: DataFrame,
    col: str,
    min_mic: int,
    max_mic: int,
    bins: int = 8,
) -> DataFrame:
    """(column, stat='hist_<i>', value=count) fixed-width histogram
    over the micro-scaled values; binning is pure integer arithmetic
    (``(v−min)·bins div span+1``) so engines can never disagree on a
    boundary. Empty bins are emitted with count 0 (the gate needs a
    fixed row set)."""
    mic = _MIC.format(c=col)
    span = int(max_mic) - int(min_mic) + 1
    # BIGINT (not DECIMAL) on purpose: DuckDB's // on DECIMAL operands
    # performs TRUE division (3.918 stays 3.918), only BIGINT // BIGINT
    # is integral — so both engines bin in int64. (v−min)·bins must fit
    # int64: micros spanning up to ~9.2e18/bins, far past any profile.
    bin_expr = f"(({mic} - {int(min_mic)}) * {int(bins)}) DIV {span}"
    counts = (
        df.filter(F.col(col).isNotNull())
        .select(F.expr(bin_expr).alias("_bin"))
        .groupBy("_bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("value"))
    )
    all_bins = df.sparkSession.range(bins).select(
        F.col("id").cast("int").alias("_bin")
    )
    return (
        all_bins.join(counts, "_bin", "left")
        .select(
            F.lit(col).alias("column"),
            F.concat(F.lit("hist_"), F.col("_bin")).alias("stat"),
            F.coalesce("value", F.lit(0).cast("bigint")).alias("value"),
        )
    )


def profile_columns(
    df: DataFrame, cols: Sequence[str], bins: int = 8
) -> DataFrame:
    """Full profile: the one-scan stats block plus a fixed-width
    histogram per column (second scan; min/max inlined from the
    metadata-sized stats collect). Long format (column, stat, value
    BIGINT) — ``min/max/sum/mean/std`` are micro-scaled."""
    stats = profile_stats(df, cols)
    ranges: Dict[str, Dict[str, int]] = {}
    for r in stats.filter(F.col("stat").isin("min", "max")).collect():
        ranges.setdefault(r["column"], {})[r["stat"]] = r["value"]
    out = stats
    for c in cols:
        mm = ranges.get(c, {})
        if mm.get("min") is None or mm.get("max") is None:
            continue  # all-null column: stats row already says so
        out = out.unionByName(
            profile_histogram(df, c, mm["min"], mm["max"], bins)
        )
    return out


# ---------------------------------------------------------------------------
# oracle
# ---------------------------------------------------------------------------


def profile_oracle_sql(
    table: str, cols: Sequence[str], bins: int = 8, where: str = "TRUE"
) -> str:
    """DuckDB replay of :func:`profile_columns` — the same micro
    scaling, DECIMAL(38,0) internals, integer division, and
    floor(sqrt(double)) finisher. The histogram min/max come from a
    scalar subquery instead of a collect (same values by
    construction)."""
    legs = []
    for c in cols:
        mic = f"CAST(floor(CAST({c} AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
        ssum = f"CAST(sum(CAST({mic} AS DECIMAL(38,0))) AS DECIMAL(38,0))"
        ssq = (
            f"CAST(sum(CAST({mic} AS DECIMAL(38,0)) * "
            f"CAST({mic} AS DECIMAL(38,0))) AS DECIMAL(38,0))"
        )
        n = f"count({c})"
        std = (
            f"CASE WHEN {n} > 1 THEN CAST(floor(sqrt("
            f"CAST(({n} * {ssq}) - ({ssum} * {ssum}) AS DOUBLE) / "
            f"CAST({n} * ({n} - 1) AS DOUBLE)"
            f")) AS BIGINT) ELSE NULL END"
        )
        legs.append(
            f"""
SELECT '{c}' AS "column", s.stat, s.value
FROM (
  SELECT {n} AS a_n, count(*) - {n} AS a_null,
         count(DISTINCT {mic}) AS a_dist,
         min({mic}) AS a_min, max({mic}) AS a_max,
         CAST({ssum} AS BIGINT) AS a_sum,
         CAST(CAST({ssum} AS HUGEINT) // {n} AS BIGINT) AS a_mean,
         {std} AS a_std
  FROM {table} WHERE {where}
) t, LATERAL (VALUES
  ('n', t.a_n), ('n_null', t.a_null), ('n_distinct', t.a_dist),
  ('min', t.a_min), ('max', t.a_max), ('sum', t.a_sum),
  ('mean', t.a_mean), ('std', t.a_std)
) AS s(stat, value)"""
        )
        # histogram: integer binning against the scalar min/max
        legs.append(
            f"""
SELECT '{c}' AS "column", 'hist_' || b.i AS stat,
       COALESCE(h.cnt, 0) AS value
FROM (SELECT CAST(range AS INT) AS i FROM range({bins})) b
LEFT JOIN (
  SELECT CAST(({mic} - mm.mn) * {bins} // (mm.mx - mm.mn + 1) AS INT) AS i,
         CAST(count(*) AS BIGINT) AS cnt
  FROM {table},
       (SELECT min({mic}) AS mn, max({mic}) AS mx
        FROM {table} WHERE {where}) mm
  WHERE {where} AND {c} IS NOT NULL
  GROUP BY 1
) h ON h.i = b.i"""
        )
    return " UNION ALL ".join(legs)
