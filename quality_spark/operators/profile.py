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


def _compact_counts(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(column, mic, cnt) — per-column micro-value frequencies from
    ONE scan: explode [(col, mic)] structs (nulls dropped, matching
    count(DISTINCT)'s null handling) → one groupBy with map-side
    combine. Size = Σ per-column distinct values — the same key volume
    an exact distinct count must shuffle in ANY engine (Spark's own
    count(DISTINCT) rewrite shuffles the identical keys via Expand,
    but duplicates every input row once per distinct column and drags
    the whole stat list through the value-keyed shuffle — measured
    8.5 s vs ~2 s at sf0.1). Every profile statistic derives from this
    table exactly."""
    # posexplode with an INT column index (not a per-row name string):
    # the hot explode+groupBy hashes (int, long) keys only — measured
    # 2-3x faster than struct/string keys; names attach AFTER the
    # aggregate, on compact rows. mic is NULL iff the input is NULL
    # (floor/cast propagate null; NaN maps to 0, matching the
    # count(DISTINCT)-over-cast semantics), so the null filter
    # reproduces count(DISTINCT)'s null handling.
    mics = [F.expr(_MIC.format(c=c)) for c in cols]
    names = F.array(*[F.lit(c) for c in cols])
    return (
        df.select(F.posexplode(F.array(*mics)).alias("_cidx", "mic"))
        .filter(F.col("mic").isNotNull())
        .groupBy("_cidx", "mic")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            F.element_at(names, F.col("_cidx") + 1).alias("column"),
            "mic",
            "cnt",
        )
    )


def _stats_long(df: DataFrame, compact: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(column, stat, value) — all 8 stats derived from the compact
    frequency table: n = Σcnt, n_distinct = row count, sum = Σ mic·cnt,
    Σx² = Σ mic²·cnt (both DECIMAL(38,0), exactly the per-row sums);
    n_null needs the table's total row count — a column-less
    footer-cheap count branch. Same DIV / floor(sqrt(double))
    finishers as the oracle, so values are bit-identical."""
    spark = df.sparkSession
    per_col = compact.groupBy("column").agg(
        F.expr("CAST(sum(cnt) AS BIGINT)").alias("_n"),
        F.expr("CAST(count(*) AS BIGINT)").alias("_dist"),
        F.expr("min(mic)").alias("_min"),
        F.expr("max(mic)").alias("_max"),
        F.expr(
            "CAST(sum(CAST(mic AS DECIMAL(38,0)) * CAST(cnt AS DECIMAL(38,0)))"
            " AS DECIMAL(38,0))"
        ).alias("_dsum"),
        F.expr(
            "CAST(sum(CAST(mic AS DECIMAL(38,0)) * CAST(mic AS DECIMAL(38,0))"
            " * CAST(cnt AS DECIMAL(38,0))) AS DECIMAL(38,0))"
        ).alias("_dssq"),
    )
    total = F.broadcast(
        df.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("_total"))
    )
    all_cols = spark.createDataFrame([(c,) for c in cols], "column string")
    joined = all_cols.join(per_col, "column", "left").crossJoin(total)
    n = "coalesce(_n, CAST(0 AS BIGINT))"
    std = (
        f"CASE WHEN {n} > 1 THEN CAST(floor(sqrt("
        f"CAST(({n} * _dssq) - (_dsum * _dsum) AS DOUBLE) / "
        f"CAST({n} * ({n} - 1) AS DOUBLE)"
        f")) AS BIGINT) ELSE CAST(NULL AS BIGINT) END"
    )
    pairs = ", ".join(
        f"named_struct('stat', '{name}', 'value', {val})"
        for name, val in [
            ("n", n),
            ("n_null", f"_total - {n}"),
            ("n_distinct", "coalesce(_dist, CAST(0 AS BIGINT))"),
            ("min", "_min"),
            ("max", "_max"),
            ("sum", "CAST(_dsum AS BIGINT)"),
            ("mean", f"CAST(_dsum DIV {n} AS BIGINT)"),
            ("std", std),
        ]
    )
    return joined.select(
        "column", F.explode(F.expr(f"array({pairs})")).alias("_sv")
    ).select("column", F.col("_sv.stat").alias("stat"), F.col("_sv.value").alias("value"))


def profile_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(column, stat, value) — 8 integer stats per column
    (micro-scaled; see module doc), all derived from the compact
    frequency table built in ONE data scan (plus a column-less
    count(*) branch for n_null). ``sum``/``mean`` overflow-safe via
    DECIMAL(38,0) internals; the emitted values are BIGINT micros."""
    return _stats_long(df, _compact_counts(df, cols), cols)


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
    """Full profile: stats block + fixed-width histograms for all
    columns. Long format (column, stat, value BIGINT) —
    ``min/max/sum/mean/std`` are micro-scaled.

    ONE data scan regardless of |cols| (plus a column-less count(*)
    branch for n_null): the compact (column, mic, cnt) frequency
    table is persisted (MEMORY_AND_DISK — its size is Σ per-column
    distinct values, the volume any exact distinct count must carry;
    spills rather than OOMs), the stats derive from it, and the
    histograms re-aggregate the SAME cached table (min/max inlined as
    literal CASE bin expressions, sum(cnt) per (column, bin) — binning
    distinct VALUES, not raw rows). The whole profile output is
    metadata-sized (|cols| × (8 + bins) rows) so it is collected and
    returned as a literal frame; the cache is unpersisted before
    returning — no leaked storage, and downstream consumers never
    re-trigger the scan."""
    from pyspark import StorageLevel

    spark = df.sparkSession
    compact = _compact_counts(df, cols).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        stat_rows = _stats_long(df, compact, cols).collect()
        ranges: Dict[str, Dict[str, int]] = {}
        for r in stat_rows:
            if r["stat"] in ("min", "max"):
                ranges.setdefault(r["column"], {})[r["stat"]] = r["value"]
        bin_case = None
        hist_cols = []
        for c in cols:
            mm = ranges.get(c, {})
            if mm.get("min") is None or mm.get("max") is None:
                continue  # all-null column: stats row already says so
            hist_cols.append(c)
            span = int(mm["max"]) - int(mm["min"]) + 1
            # same BIGINT DIV binning as the oracle (see profile_histogram)
            binned = F.expr(
                f"((mic - {int(mm['min'])}) * {int(bins)}) DIV {span}"
            ).cast("int")
            cond = F.col("column") == c
            bin_case = (
                F.when(cond, binned)
                if bin_case is None
                else bin_case.when(cond, binned)
            )
        hist_rows = []
        if hist_cols:
            counts = (
                compact.select("column", bin_case.alias("_bin"), "cnt")
                .groupBy("column", "_bin")
                .agg(F.sum("cnt").cast("bigint").alias("value"))
            )
            all_bins = spark.createDataFrame(
                [(c, b) for c in hist_cols for b in range(int(bins))],
                "column string, _bin int",
            )
            hist_rows = (
                all_bins.join(counts, ["column", "_bin"], "left")
                .select(
                    "column",
                    F.concat(F.lit("hist_"), F.col("_bin")).alias("stat"),
                    F.coalesce("value", F.lit(0).cast("bigint")).alias(
                        "value"
                    ),
                )
                .collect()
            )
    finally:
        compact.unpersist()
    return spark.createDataFrame(
        stat_rows + hist_rows, "column string, stat string, value bigint"
    )


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
