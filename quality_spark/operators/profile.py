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
- min / max / sum / mean: BIGINT min/max, DECIMAL(38,0) sum
  accumulation (overflow-free while Σ|x| < 10^38 micros), mean =
  integer ``div``. An emitted sum past int64 is CLAMPED to the
  +-9223372036854775807/8 sentinels in BOTH engines — never a silent
  NULL (non-ANSI Spark) vs an error (ANSI Spark / DuckDB).
- stddev: the numerator ``n·Σx² − (Σx)²`` stays exact in
  DECIMAL(38,0); only the final ``floor(sqrt(num / (n·(n−1))))`` goes
  through double — sqrt is correctly rounded IEEE over an identical
  input, so the floored micro result matches bit-for-bit. When the
  numerator would exceed DECIMAL(38,0) (Σ|x| past ~10^19 micros — far
  beyond micro-exactness), a double-evaluated guard (same branch in
  both engines) emits NULL instead of overflowing. Accumulator domain
  bound: Σx² < 10^38 requires per-value |x| ≲ 10^6 units for ~10^14
  rows — comfortably past 100 TB of typical profiled columns; columns
  of astronomical magnitudes should be pre-scaled.
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

#: int64 bounds for the emitted-sum clamp (ADVICE r08): a micro-sum
#: past +-9.2e18 DECIMAL-accumulates fine but cannot be EMITTED as
#: BIGINT — non-ANSI Spark would silently NULL it while the DuckDB
#: oracle raises. Both engines clamp to these explicit sentinels
#: instead, so an overflowing profile is visible (and identical)
#: rather than divergent.
_I64_MAX = 9223372036854775807
_I64_MIN = -9223372036854775808

#: micro scaling: one double multiply + floor — byte-identical on any
#: IEEE engine, and every later stat is integer arithmetic on this
_MIC = "CAST(floor(CAST({c} AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"

STAT_NAMES = ("n", "n_null", "n_distinct", "min", "max", "sum", "mean", "std")


def _std_safe_sql(dsum: str, dssq: str, n: str) -> str:
    """TRUE iff the exact std numerator ``n*dssq - dsum^2`` fits
    DECIMAL(38,0). Evaluated in DOUBLE (a correctly-rounded
    decimal->double conversion + one multiply — identical in Spark
    and DuckDB, so both engines always take the same branch) against
    9.9e37 / 9.9e18 thresholds with 1% slack for the double rounding.
    Outside the bound both engines emit NULL std (the value would be
    past micro-exactness anyway) instead of Spark raising/NULLing on
    decimal overflow while DuckDB errors."""
    return (
        f"(CAST({dssq} AS DOUBLE) * {n} < 9.9e37"
        f" AND abs(CAST({dsum} AS DOUBLE)) < 9.9e18)"
    )


def _clamped_sum_sql(dsum: str) -> str:
    """Emit a DECIMAL(38,0) micro-sum as BIGINT, clamped to the int64
    bounds (identical SQL semantics in Spark and DuckDB — see
    _I64_MAX note). mean never needs this: it is bounded by max(mic),
    which is already BIGINT."""
    return (
        f"CASE WHEN {dsum} > CAST('{_I64_MAX}' AS DECIMAL(38,0))"
        f" THEN CAST({_I64_MAX} AS BIGINT)"
        f" WHEN {dsum} < CAST('{_I64_MIN}' AS DECIMAL(38,0))"
        f" THEN CAST('{_I64_MIN}' AS BIGINT)"
        f" ELSE CAST({dsum} AS BIGINT) END"
    )


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
    per_col = _per_col_aggs(compact)
    total = F.broadcast(
        df.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("_total"))
    )
    all_cols = spark.createDataFrame([(c,) for c in cols], "column string")
    joined = all_cols.join(per_col, "column", "left").crossJoin(total)
    n = "coalesce(_n, CAST(0 AS BIGINT))"
    return _stat_rows_select(joined, n, f"_total - {n}")


def _per_col_aggs(
    compact: DataFrame, keys: Sequence[str] = ("column",)
) -> DataFrame:
    """The per-column stat accumulators over a (column, mic, cnt)
    frequency table (null-mic rows must be filtered out first) —
    shared by the single-frame and the merged-shards paths, so the
    two are bit-identical by construction. ``keys`` widens the
    grouping (e.g. a shard-group tag) without touching the
    accumulator expressions."""
    return compact.groupBy(*keys).agg(
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


def _stat_rows_select(
    joined: DataFrame, n: str, n_null: str, keep: Sequence[str] = ("column",)
) -> DataFrame:
    """(column, stat, value) from a joined accumulator frame — the
    DIV / floor(sqrt(double)) finishers shared by every exact path
    (single frame, merged shards) and mirrored by the oracle.
    ``keep`` carries extra grouping columns (e.g. a shard-group tag)
    through unchanged."""
    std = (
        f"CASE WHEN {n} > 1 AND {_std_safe_sql('_dsum', '_dssq', n)} "
        f"THEN CAST(floor(sqrt("
        f"CAST(({n} * _dssq) - (_dsum * _dsum) AS DOUBLE) / "
        f"CAST({n} * ({n} - 1) AS DOUBLE)"
        f")) AS BIGINT) ELSE CAST(NULL AS BIGINT) END"
    )
    pairs = ", ".join(
        f"named_struct('stat', '{name}', 'value', {val})"
        for name, val in [
            ("n", n),
            ("n_null", n_null),
            ("n_distinct", "coalesce(_dist, CAST(0 AS BIGINT))"),
            ("min", "_min"),
            ("max", "_max"),
            ("sum", _clamped_sum_sql("_dsum")),
            ("mean", f"CAST(_dsum DIV {n} AS BIGINT)"),
            ("std", std),
        ]
    )
    return joined.select(
        *keep, F.explode(F.expr(f"array({pairs})")).alias("_sv")
    ).select(
        *keep,
        F.col("_sv.stat").alias("stat"),
        F.col("_sv.value").alias("value"),
    )


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


def _q_stat_name(q: float) -> str:
    """'p25', 'p50', 'p99.9' — shared with the oracle builder."""
    return f"p{q * 100:g}"


def _rank_sql(q: float, n: str) -> str:
    """Nearest-rank index as BOTH engines compute it: one IEEE
    multiply of the exact q literal by n (exact int->double), ceil,
    clamped to >= 1. Python's math.ceil(q * float(n)) is the same
    arithmetic, so driver-side and in-SQL ranks always agree."""
    return f"GREATEST(1, CAST(ceil(CAST('{q!r}' AS DOUBLE) * {n}) AS BIGINT))"


def _finish_approx_stats(
    n: int, total: int, dsum, dssq, mn, mx, nd
) -> Dict[str, object]:
    """The raw-scan-path stat finishers over exact integer
    accumulators — shared by the single-frame approx path and the
    mergeable approx-shard path so their non-sketch stats cannot
    drift (and both stay bit-identical to EXACT mode, test-pinned)."""
    import math

    mean = std = None
    if n > 0 and dsum is not None:
        # SQL DIV truncates toward zero (Python // floors) —
        # replicate exactly so negative means match the exact path
        q, sign = abs(dsum) // n, (1 if dsum >= 0 else -1)
        mean = sign * q
    if n > 1 and dsum is not None and dssq is not None:
        # same double-evaluated overflow guard as _std_safe_sql
        # (float(int) is the identical correctly-rounded conversion)
        if float(dssq) * n < 9.9e37 and abs(float(dsum)) < 9.9e18:
            num = n * dssq - dsum * dsum
            std = int(
                math.floor(math.sqrt(float(num) / float(n * (n - 1))))
            )
    clamped = None if dsum is None else max(_I64_MIN, min(_I64_MAX, dsum))
    return {
        "n": n,
        "n_null": total - n,
        "n_distinct": nd,
        "min": mn,
        "max": mx,
        "sum": clamped,
        "mean": mean,
        "std": std if n > 1 else None,
    }


def _approx_stat_rows(
    df: DataFrame,
    cols: Sequence[str],
    rsd: float,
    quantiles: Sequence[float] = (),
) -> List[tuple]:
    """(column, stat, value) rows from ONE raw-scan aggregate — the
    scale path: every stat except n_distinct is EXACT and
    bit-identical to the compact-table path (same DECIMAL(38,0)
    accumulation, same DIV / floor(sqrt(double)) finishers, replayed
    here in Python over exact integers); n_distinct is
    approx_count_distinct (HyperLogLog++, relative sd ``rsd``). The
    aggregate state is |cols| x (a few longs + one HLL sketch) — no
    per-distinct-value shuffle volume at all."""
    proj = df.select(
        *[
            F.expr(_MIC.format(c=c)).alias(f"_m{i}")
            for i, c in enumerate(cols)
        ]
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_total")]
    for i in range(len(cols)):
        m = f"_m{i}"
        aggs += [
            F.count(m).cast("bigint").alias(f"_n{i}"),
            F.approx_count_distinct(m, float(rsd)).cast("bigint").alias(f"_d{i}"),
            F.min(m).alias(f"_mn{i}"),
            F.max(m).alias(f"_mx{i}"),
            F.expr(
                f"CAST(sum(CAST({m} AS DECIMAL(38,0))) AS DECIMAL(38,0))"
            ).alias(f"_s{i}"),
            F.expr(
                f"CAST(sum(CAST({m} AS DECIMAL(38,0)) * CAST({m} AS DECIMAL(38,0)))"
                f" AS DECIMAL(38,0))"
            ).alias(f"_q{i}"),
        ]
        if quantiles:
            qlist = ", ".join(f"CAST('{float(q)!r}' AS DOUBLE)" for q in quantiles)
            aggs.append(
                F.expr(
                    f"approx_percentile({m}, array({qlist}), 10000)"
                ).alias(f"_p{i}")
            )
    row = proj.groupBy().agg(*aggs).collect()[0]
    total = int(row["_total"])
    out: List[tuple] = []
    for i, c in enumerate(cols):
        n = int(row[f"_n{i}"])
        vals = _finish_approx_stats(
            n=n,
            total=total,
            dsum=None if row[f"_s{i}"] is None else int(row[f"_s{i}"]),
            dssq=None if row[f"_q{i}"] is None else int(row[f"_q{i}"]),
            mn=row[f"_mn{i}"],
            mx=row[f"_mx{i}"],
            nd=0 if n == 0 else int(row[f"_d{i}"]),
        )
        out.extend((c, s, vals[s]) for s in STAT_NAMES)
        if quantiles and n > 0:
            ps = row[f"_p{i}"]
            out.extend(
                (c, _q_stat_name(q), None if p is None else int(p))
                for q, p in zip(quantiles, ps)
            )
    return out


def profile_columns(
    df: DataFrame,
    cols: Sequence[str],
    bins: int = 8,
    approx: bool = False,
    rsd: float = 0.05,
    quantiles: Sequence[float] = (),
) -> DataFrame:
    """Full profile: stats block + fixed-width histograms for all
    columns. Long format (column, stat, value BIGINT) —
    ``min/max/sum/mean/std`` are micro-scaled.

    ``quantiles`` (round 9 — the stat BETWEEN-rule authoring actually
    needs): nearest-rank quantiles over the micro values, emitted as
    ``p25``/``p50``/... rows. Exact mode derives them from the SAME
    cached compact table (a per-column cumulative-count window — no
    extra scan) with rank = max(1, ceil(q*n)) computed by the
    identical IEEE multiply in both engines, so values are
    oracle-replayable bit-for-bit. Approx mode uses
    ``approx_percentile`` over the same single raw-scan aggregate
    (rank error <= n/10000 — exact below 10k rows); like n_distinct,
    approx quantiles are excluded from the bit-identity pin.

    EXACT mode (default — the oracle-gated spec): ONE data scan
    regardless of |cols| (plus a column-less count(*) branch for
    n_null): the compact (column, mic, cnt) frequency table is
    persisted (MEMORY_AND_DISK — its size is Σ per-column distinct
    values, the volume any exact distinct count must carry; spills
    rather than OOMs), the stats derive from it, and the histograms
    re-aggregate the SAME cached table (min/max inlined as literal
    CASE bin expressions, sum(cnt) per (column, bin) — binning
    distinct VALUES, not raw rows). The whole profile output is
    metadata-sized (|cols| × (8 + bins) rows) so it is collected and
    returned as a literal frame; the cache is unpersisted before
    returning — no leaked storage, and downstream consumers never
    re-trigger the scan.

    APPROX mode (``approx=True`` — the 100 TB default): a profiling
    pass that exists to AUTHOR DQ rules rarely needs exact
    n_distinct, and for continuous columns the exact compact table is
    ~corpus-sized. This mode skips it entirely: pass 1 is one
    raw-scan aggregate whose state is |cols| × (a few longs + one
    HyperLogLog++ sketch at relative sd ``rsd``); pass 2 bins the raw
    rows with the same integer bin expression. Two scans, ZERO
    per-distinct-value shuffle volume, nothing persisted. Every stat
    except n_distinct — and the histograms — is bit-identical to
    exact mode (pinned by tests); n_distinct carries the documented
    HLL ``rsd``."""
    from pyspark import StorageLevel

    spark = df.sparkSession
    if approx:
        stat_tuples = _approx_stat_rows(df, cols, rsd, quantiles)
        ranges_a: Dict[str, Dict[str, int]] = {}
        for c, s, v in stat_tuples:
            if s in ("min", "max"):
                ranges_a.setdefault(c, {})[s] = v
        hist_cols = [
            c
            for c in cols
            if ranges_a.get(c, {}).get("min") is not None
            and ranges_a.get(c, {}).get("max") is not None
        ]
        hist_tuples: List[tuple] = []
        if hist_cols:
            bexprs = []
            for c in hist_cols:
                mm = ranges_a[c]
                span = int(mm["max"]) - int(mm["min"]) + 1
                mic = _MIC.format(c=c)
                bexprs.append(
                    F.expr(
                        f"(({mic} - {int(mm['min'])}) * {int(bins)}) DIV {span}"
                    )
                )
            counted = {
                (int(r["_cidx"]), int(r["_bin"])): int(r["value"])
                for r in (
                    df.select(
                        F.posexplode(F.array(*bexprs)).alias("_cidx", "_bin")
                    )
                    .filter(F.col("_bin").isNotNull())
                    .groupBy("_cidx", "_bin")
                    .agg(F.count(F.lit(1)).cast("bigint").alias("value"))
                    .collect()
                )
            }
            for i, c in enumerate(hist_cols):
                for b in range(int(bins)):
                    hist_tuples.append(
                        (c, f"hist_{b}", counted.get((i, b), 0))
                    )
        return spark.createDataFrame(
            stat_tuples + hist_tuples,
            "column string, stat string, value bigint",
        )
    compact = _compact_counts(df, cols).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        stat_rows = _stats_long(df, compact, cols).collect()
        hist_rows, q_rows = _hist_and_quantile_rows(
            spark, compact, stat_rows, cols, bins, quantiles
        )
    finally:
        compact.unpersist()
    return spark.createDataFrame(
        stat_rows + q_rows + hist_rows,
        "column string, stat string, value bigint",
    )


def _hist_and_quantile_rows(
    spark,
    compact: DataFrame,
    stat_rows,
    cols: Sequence[str],
    bins: int,
    quantiles: Sequence[float],
) -> tuple:
    """(hist_rows, q_rows) from the cached compact table with ONE
    aggregation job for both (round 13, second pass): the histogram
    bin counts and the quantile coarse-bucket totals are independent
    aggregates over the same cached table and previously cost two
    sequential collect round trips — they now ride one tagged union
    (the aggregations themselves are unchanged), and the missing-bin
    zero fill that used a literal-frame left join happens on the
    driver, where the literal frame came from. Shared by
    profile_columns and profile_from_shards.

    Histograms: min/max inlined from the already-collected stat rows
    as literal CASE bin expressions — the same BIGINT DIV binning as
    the oracle (see profile_histogram), over distinct VALUES weighted
    by cnt, not raw rows.

    Quantiles: exact two-phase BUCKETED pick instead of a cumulative
    window partitioned only by column — on a high-distinct column
    that window put the whole cumulative sum in ONE task (583k rows
    at sf0.1; billions at scale — the guide §2.5 straggler shape).
    Phase 1 aggregates monotone coarse buckets (integer shift, <=4096
    per column) in parallel and collects the KB-sized bucket table;
    the driver walks each column's bucket prefix sums to find every
    rank's target bucket and the cumulative count before it; phase 2
    scans ONLY target-bucket values with a tiny in-bucket window.
    ``cum_before + in-bucket cum >= rank`` is the identical
    nearest-rank comparison with rank = max(1, ceil(q*n)) computed by
    the identical IEEE multiply in both engines, so values are
    bit-equal to the window form (regression-pinned in tests)."""
    import math

    from pyspark.sql import Window

    ranges: Dict[str, Dict[str, int]] = {}
    for r in stat_rows:
        if r["stat"] in ("min", "max"):
            ranges.setdefault(r["column"], {})[r["stat"]] = r["value"]

    # -- histogram branch (bins > 0) --
    hist_cols: List[str] = []
    hist_df = None
    if int(bins) > 0:
        bin_case = None
        for c in cols:
            mm = ranges.get(c, {})
            if mm.get("min") is None or mm.get("max") is None:
                continue  # all-null column: stats row already says so
            hist_cols.append(c)
            span = int(mm["max"]) - int(mm["min"]) + 1
            binned = F.expr(
                f"((mic - {int(mm['min'])}) * {int(bins)}) DIV {span}"
            ).cast("int")
            cond = F.col("column") == c
            bin_case = (
                F.when(cond, binned)
                if bin_case is None
                else bin_case.when(cond, binned)
            )
        if hist_cols:
            hist_df = (
                compact.select("column", bin_case.alias("_bin"), "cnt")
                .groupBy("column", "_bin")
                .agg(F.sum("cnt").cast("bigint").alias("_v"))
                .select(
                    "column",
                    F.col("_bin").cast("bigint").alias("_k"),
                    "_v",
                    F.lit("h").alias("_tag"),
                )
            )

    # -- quantile coarse-bucket branch --
    n_of = {
        r["column"]: r["value"] for r in stat_rows if r["stat"] == "n"
    }
    mins = {
        r["column"]: r["value"] for r in stat_rows if r["stat"] == "min"
    }
    maxs = {
        r["column"]: r["value"] for r in stat_rows if r["stat"] == "max"
    }
    rank_rows = [
        (
            c,
            _q_stat_name(q),
            int(max(1, math.ceil(float(q) * float(n_of[c])))),
        )
        for c in cols
        if n_of.get(c)
        for q in quantiles
    ] if quantiles else []
    buck_df = None
    b_expr = None
    if rank_rows:
        live = sorted({c for c, _, _ in rank_rows})
        shift = {}
        for c in live:
            span = int(maxs[c]) - int(mins[c]) + 1
            s = 0
            while (span >> s) > 4096:
                s += 1
            shift[c] = s
        lo_case = "CASE " + " ".join(
            f"WHEN column = '{c}' THEN CAST({int(mins[c])} AS BIGINT)"
            for c in live
        ) + " END"
        sh_case = "CASE " + " ".join(
            f"WHEN column = '{c}' THEN {shift[c]}" for c in live
        ) + " END"
        b_expr = F.expr(
            f"shiftright(CAST(mic AS BIGINT) - ({lo_case}), ({sh_case}))"
        )
        buck_df = (
            compact.filter(F.col("column").isin(live))
            .groupBy("column", b_expr.alias("_b"))
            .agg(F.sum("cnt").cast("bigint").alias("_v"))
            .select(
                "column",
                F.col("_b").alias("_k"),
                "_v",
                F.lit("b").alias("_tag"),
            )
        )

    # -- ONE job for whichever branches exist --
    fused = (
        hist_df.unionByName(buck_df)
        if hist_df is not None and buck_df is not None
        else (hist_df if hist_df is not None else buck_df)
    )
    h_counts: dict = {}
    per_col: dict = {}
    if fused is not None:
        for r in fused.collect():
            if r["_k"] is None:
                continue  # hist rows from columns outside hist_cols
            if r["_tag"] == "h":
                h_counts[(r["column"], int(r["_k"]))] = int(r["_v"])
            else:
                per_col.setdefault(r["column"], []).append(
                    (int(r["_k"]), int(r["_v"]))
                )
    hist_rows = [
        (c, f"hist_{b}", h_counts.get((c, b), 0))
        for c in hist_cols
        for b in range(int(bins))
    ]

    # -- in-bucket rank pick (tiny job) --
    if not rank_rows:
        return hist_rows, []
    for bl in per_col.values():
        bl.sort()
    target_rows = []
    for c, stat, rank in rank_rows:
        cum = 0
        for b, cnt in per_col.get(c, []):
            if cum + cnt >= rank:
                target_rows.append((c, stat, rank, b, cum))
                break
            cum += cnt
    if not target_rows:
        return hist_rows, []
    targets_df = spark.createDataFrame(
        target_rows,
        "column string, stat string, rank bigint, tb bigint, "
        "cumb bigint",
    )
    w_in = (
        Window.partitionBy("column", "stat")
        .orderBy("mic")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    q_rows = [
        tuple(r)
        for r in (
            compact.withColumn("_b", b_expr)
            .join(F.broadcast(targets_df), "column")
            .filter(F.col("_b") == F.col("tb"))
            .withColumn("cum", F.sum("cnt").over(w_in) + F.col("cumb"))
            .filter(F.col("cum") >= F.col("rank"))
            .groupBy("column", "stat")
            .agg(F.min("mic").alias("value"))
            .collect()
        )
    ]
    return hist_rows, q_rows


# ---------------------------------------------------------------------------
# mergeable shard artifacts (round 9)
# ---------------------------------------------------------------------------


def profile_shard(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """The persistable, MERGEABLE profile artifact for one shard:
    (column, mic, cnt) — the same compact frequency table the exact
    profile derives everything from, PLUS one ``mic IS NULL`` row per
    column carrying the shard's null count (the information
    ``_compact_counts`` drops and ``profile_columns`` recovers from a
    whole-frame count(*), which a merge of artifacts cannot replay).

    The 100 TB workflow this enables: profile each ingest batch / day
    partition ONCE as it lands, persist the artifact (parquet — it is
    a plain 3-column frame), and answer "profile of any union of
    shards" by merging artifacts — no re-scan of any shard, ever.
    ``profile_from_shards(shards) == profile_columns(union of
    shards)`` bit-for-bit (oracle-gated), because every stat is an
    associative reduction over (mic, cnt): counts/sums add, min/max
    combine, distincts re-dedup on the merged keys, and quantiles/
    histograms re-aggregate the merged table exactly like the
    single-frame path re-aggregates its cached one."""
    mics = [F.expr(_MIC.format(c=c)) for c in cols]
    names = F.array(*[F.lit(c) for c in cols])
    return (
        df.select(F.posexplode(F.array(*mics)).alias("_cidx", "mic"))
        .groupBy("_cidx", "mic")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            F.element_at(names, F.col("_cidx") + 1).alias("column"),
            "mic",
            "cnt",
        )
    )


def merge_profile_shards(shards: Sequence[DataFrame]) -> DataFrame:
    """Union shard artifacts and re-add counts per (column, mic) —
    associative and commutative, so artifacts can be merged in any
    grouping (day → month → year rollups reuse merged artifacts as
    inputs). Null-mic rows merge like any other key, accumulating the
    total null count."""
    if not shards:
        raise ValueError("merge_profile_shards needs at least one shard")
    merged = shards[0]
    for s in shards[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("column", "mic").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def profile_from_shards(
    shards: Sequence[DataFrame],
    cols: Sequence[str],
    bins: int = 8,
    quantiles: Sequence[float] = (),
) -> DataFrame:
    """Full profile (stats + histograms + nearest-rank quantiles) from
    per-shard artifacts (``profile_shard``), WITHOUT rescanning any
    shard — bit-identical to ``profile_columns(union of shards, cols,
    bins, quantiles)`` (driver-gated against the whole-corpus oracle).
    Cost: one shuffle over Σ artifact sizes (bounded by per-shard
    distinct counts, not row counts), then the same metadata-sized
    finishers as the single-frame exact path."""
    merged = merge_profile_shards(shards)
    spark = merged.sparkSession
    from pyspark import StorageLevel

    merged = merged.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        compact = merged.filter(F.col("mic").isNotNull())
        nulls = merged.filter(F.col("mic").isNull()).select(
            "column", F.col("cnt").alias("_nulls")
        )
        all_cols = spark.createDataFrame(
            [(c,) for c in cols], "column string"
        )
        joined = (
            all_cols.join(_per_col_aggs(compact), "column", "left")
            .join(F.broadcast(nulls), "column", "left")
        )
        n = "coalesce(_n, CAST(0 AS BIGINT))"
        stat_rows = _stat_rows_select(
            joined, n, "coalesce(_nulls, CAST(0 AS BIGINT))"
        ).collect()
        # bins=0 skips histograms entirely — the right call when the
        # consumer (e.g. profile_drift) reads named stats only
        hist_rows, q_rows = _hist_and_quantile_rows(
            spark, compact, stat_rows, cols, bins, quantiles
        )
    finally:
        merged.unpersist()
    return spark.createDataFrame(
        stat_rows + q_rows + hist_rows,
        "column string, stat string, value bigint",
    )


def profiles_from_shard_groups(
    groups: Sequence[Sequence[DataFrame]], cols: Sequence[str]
) -> List[DataFrame]:
    """N stats-only shard-group profiles in ONE job (round 14): the
    bit-identical equivalent of ``[profile_from_shards(g, cols,
    bins=0) for g in groups]``, but every group's artifact union rides
    one tagged aggregation and one driver collect instead of a
    sequential collect per group. Used where several shard profiles
    are consumed together (profile_drift's baseline+current); the
    accumulator expressions and DIV / floor(sqrt(double)) finishers
    are the shared ``_per_col_aggs`` / ``_stat_rows_select`` code, so
    values are bit-identical to the per-group path (the extra ``_g``
    grouping key changes row routing, not any exact integer/decimal
    aggregate)."""
    if not groups or any(not g for g in groups):
        raise ValueError("profiles_from_shard_groups needs non-empty groups")
    tagged = None
    for gi, shards in enumerate(groups):
        m = shards[0]
        for s in shards[1:]:
            m = m.unionByName(s)
        m = m.select(F.lit(gi).alias("_g"), "column", "mic", "cnt")
        tagged = m if tagged is None else tagged.unionByName(m)
    merged = tagged.groupBy("_g", "column", "mic").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    spark = merged.sparkSession
    compact = merged.filter(F.col("mic").isNotNull())
    nulls = merged.filter(F.col("mic").isNull()).select(
        "_g", "column", F.col("cnt").alias("_nulls")
    )
    all_cols = spark.createDataFrame(
        [(gi, c) for gi in range(len(groups)) for c in cols],
        "_g int, column string",
    )
    joined = (
        all_cols.join(
            _per_col_aggs(compact, keys=("_g", "column")),
            ["_g", "column"],
            "left",
        )
        .join(F.broadcast(nulls), ["_g", "column"], "left")
    )
    n = "coalesce(_n, CAST(0 AS BIGINT))"
    rows = _stat_rows_select(
        joined, n, "coalesce(_nulls, CAST(0 AS BIGINT))",
        keep=("_g", "column"),
    ).collect()
    by_g: Dict[int, list] = {}
    for r in rows:
        by_g.setdefault(int(r["_g"]), []).append(
            (r["column"], r["stat"], r["value"])
        )
    return [
        spark.createDataFrame(
            by_g.get(gi, []), "column string, stat string, value bigint"
        )
        for gi in range(len(groups))
    ]


def profile_by_group(
    df: DataFrame,
    group_col: str,
    cols: Sequence[str],
    rsd: float = 0.05,
) -> DataFrame:
    """Segmented profile: (group, column, stat, value BIGINT) — the
    same 8 stats as ``profile_columns``, per GROUP (per language, per
    source domain, per return flag …), from ONE groupBy aggregate.
    The mixture-QA question "does l_discount behave the same in every
    segment" is this plus ``profile_drift`` on two groups' rows.

    Unlike the whole-frame profilers the output is groups × cols × 8
    rows — potentially data-sized — so nothing is collected and the
    finishers run IN-ENGINE (the same integer DIV / floor(sqrt)
    spec, so every stat except the HLL++ ``n_distinct`` replays
    exactly in the DuckDB twin). NULL groups profile under a NULL
    group key (they are data too)."""
    mics = [F.expr(_MIC.format(c=c)) for c in cols]
    proj = df.select(
        F.col(group_col).cast("string").alias("__grp"),
        *[m.alias(f"_m{i}") for i, m in enumerate(mics)],
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_total")]
    for i in range(len(cols)):
        m = f"_m{i}"
        aggs += [
            F.count(m).cast("bigint").alias(f"_n{i}"),
            F.approx_count_distinct(m, float(rsd))
            .cast("bigint")
            .alias(f"_d{i}"),
            F.min(m).alias(f"_mn{i}"),
            F.max(m).alias(f"_mx{i}"),
            F.expr(
                f"CAST(sum(CAST({m} AS DECIMAL(38,0))) AS DECIMAL(38,0))"
            ).alias(f"_s{i}"),
            F.expr(
                f"CAST(sum(CAST({m} AS DECIMAL(38,0)) * CAST({m} AS DECIMAL(38,0)))"
                f" AS DECIMAL(38,0))"
            ).alias(f"_q{i}"),
        ]
    g = proj.groupBy("__grp").agg(*aggs)
    col_structs = []
    for i, c in enumerate(cols):
        n = f"_n{i}"
        std = (
            f"CASE WHEN {n} > 1 AND "
            f"{_std_safe_sql(f'_s{i}', f'_q{i}', n)} "
            f"THEN CAST(floor(sqrt("
            f"CAST(({n} * _q{i}) - (_s{i} * _s{i}) AS DOUBLE) / "
            f"CAST({n} * ({n} - 1) AS DOUBLE)"
            f")) AS BIGINT) ELSE CAST(NULL AS BIGINT) END"
        )
        pairs = ", ".join(
            f"named_struct('stat', '{name}', 'value', {val})"
            for name, val in [
                ("n", n),
                ("n_null", f"_total - {n}"),
                ("n_distinct", f"CASE WHEN {n} = 0 THEN CAST(0 AS BIGINT)"
                               f" ELSE _d{i} END"),
                ("min", f"_mn{i}"),
                ("max", f"_mx{i}"),
                ("sum", _clamped_sum_sql(f"_s{i}")),
                ("mean", f"CAST(_s{i} DIV {n} AS BIGINT)"),
                ("std", std),
            ]
        )
        col_structs.append(
            f"named_struct('column', '{c}', 'stats', array({pairs}))"
        )
    return (
        g.select(
            F.col("__grp").alias("group"),
            F.explode(F.expr(f"array({', '.join(col_structs)})")).alias(
                "_cs"
            ),
        )
        .select(
            "group",
            F.col("_cs.column").alias("column"),
            F.explode("_cs.stats").alias("_sv"),
        )
        .select(
            "group",
            "column",
            F.col("_sv.stat").alias("stat"),
            F.col("_sv.value").alias("value"),
        )
    )


def profile_by_group_oracle_sql(
    table: str, group_col: str, cols: Sequence[str]
) -> str:
    """DuckDB replay of ``profile_by_group`` MINUS the ``n_distinct``
    rows (HLL++ is engine-specific; every other stat is exact and
    must match bit-for-bit). Same micro scaling, DECIMAL accumulation,
    DIV/floor(sqrt) finishers, int64 sum clamp."""
    per_col = []
    for c in cols:
        mic = _MIC.format(c=c)
        agg = (
            f"SELECT CAST({group_col} AS VARCHAR) AS grp,"
            f" CAST(count(*) AS BIGINT) AS total,"
            f" CAST(count({mic}) AS BIGINT) AS n,"
            f" min({mic}) AS mn, max({mic}) AS mx,"
            f" CAST(sum(CAST({mic} AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,"
            f" CAST(sum(CAST({mic} AS DECIMAL(38,0)) * CAST({mic} AS DECIMAL(38,0)))"
            f" AS DECIMAL(38,0)) AS q"
            f" FROM {table} GROUP BY 1"
        )
        std = (
            f"CASE WHEN n > 1 AND {_std_safe_sql('s', 'q', 'n')} "
            f"THEN CAST(floor(sqrt("
            f"CAST((n * q) - (s * s) AS DOUBLE) / "
            f"CAST(n * (n - 1) AS DOUBLE)"
            f")) AS BIGINT) ELSE CAST(NULL AS BIGINT) END"
        )
        per_col.append(
            f"SELECT grp AS \"group\", '{c}' AS \"column\","
            f" u.stat, u.value FROM ({agg}), LATERAL (VALUES"
            f" ('n', n), ('n_null', total - n), ('min', mn), ('max', mx),"
            f" ('sum', {_clamped_sum_sql('s')}),"
            f" ('mean', CAST(CAST(s AS HUGEINT) // n AS BIGINT)),"
            f" ('std', {std})"
            f") AS u(stat, value)"
        )
    return "\nUNION ALL\n".join(per_col)


def profile_shard_approx(
    df: DataFrame,
    cols: Sequence[str],
    bins: int = 0,
    ranges: Dict[str, tuple] = None,
) -> DataFrame:
    """The APPROX mergeable artifact — one row per column: exact
    integer accumulators (n, n_null, min, max, DECIMAL(38,0) Σx and
    Σx²) plus a Datasketches HLL sketch (``hll_sketch_agg``, binary,
    default lgConfigK so shards always union). ONE raw-scan aggregate
    per shard, state = |cols| × (a few longs + one sketch) — no
    per-distinct-value volume at all, unlike the exact artifact whose
    size is the shard's distinct count.

    ``bins`` > 0 (round 10 — VERDICT r09 next #4) additionally packs
    a FIXED-BIN histogram into the artifact (``h_lo``/``h_span``
    bounds + ``hist`` array<bigint>), binned over the caller-declared
    micro range ``ranges[col] = (lo_mic, hi_mic)`` with the exact
    profiler's integer bin spec ``(v − lo)·bins DIV span`` (span =
    hi − lo + 1), clamped into the edge bins. Fixed caller ranges are
    what make the histograms MERGEABLE: every shard bins identically,
    so merged counts are exact bin counts of the union, and
    ``profile_from_approx_shards(quantiles=…)`` derives
    nearest-rank quantile ESTIMATES with error < ceil(span/bins)
    micro units (the bin width; out-of-range values clamp into the
    edge bins and degrade the bound by the clamp distance). Declare
    ranges from schema knowledge or a prior exact profile's min/max.
    With ``bins=0`` (default) the histogram columns ride as NULLs and
    the artifact is byte-compatible with the round-9 shape plus three
    nullable columns.

    This completes the shard matrix: exact artifacts when bit-exact
    n_distinct/quantiles/histograms matter, approx artifacts when the
    per-day profile of a 100 TB stream must cost one aggregate and a
    few KB. Merge with ``profile_from_approx_shards`` — every stat
    except n_distinct is EXACT and identical to both profile_columns
    modes (shared finishers, test-pinned); n_distinct is the
    estimate of the UNIONED sketch (not a sum of per-shard
    estimates)."""
    bins = int(bins)
    if bins > 0:
        if not ranges:
            raise ValueError("bins > 0 requires ranges={col: (lo, hi)}")
        missing = [c for c in cols if c not in ranges]
        if missing:
            raise ValueError(f"ranges missing for columns: {missing}")
        for c in cols:
            lo, hi = int(ranges[c][0]), int(ranges[c][1])
            if lo > hi:
                raise ValueError(f"range lo > hi for column {c!r}")
    mics = [F.expr(_MIC.format(c=c)) for c in cols]
    proj = df.select(
        *[m.alias(f"_m{i}") for i, m in enumerate(mics)]
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_total")]
    for i, c in enumerate(cols):
        m = f"_m{i}"
        aggs += [
            F.count(m).cast("bigint").alias(f"_n{i}"),
            F.min(m).alias(f"_mn{i}"),
            F.max(m).alias(f"_mx{i}"),
            F.expr(
                f"CAST(sum(CAST({m} AS DECIMAL(38,0))) AS DECIMAL(38,0))"
            ).alias(f"_s{i}"),
            F.expr(
                f"CAST(sum(CAST({m} AS DECIMAL(38,0)) * CAST({m} AS DECIMAL(38,0)))"
                f" AS DECIMAL(38,0))"
            ).alias(f"_q{i}"),
            F.expr(f"hll_sketch_agg({m})").alias(f"_h{i}"),
        ]
        if bins > 0:
            lo, hi = int(ranges[c][0]), int(ranges[c][1])
            span = hi - lo + 1
            # same integer bin spec as the exact histogram; DIV
            # truncation vs floor on a negative numerator both land
            # in bin 0 after the GREATEST clamp, so the clamped index
            # is engine-identical
            idx = (
                f"LEAST(GREATEST(({m} - {lo}) * {bins} DIV {span},"
                f" 0), {bins - 1})"
            )
            counts = ", ".join(
                f"CAST(sum(CASE WHEN {m} IS NOT NULL AND {idx} = {b}"
                f" THEN 1 ELSE 0 END) AS BIGINT)"
                for b in range(bins)
            )
            aggs.append(F.expr(f"array({counts})").alias(f"_hist{i}"))

    one = proj.groupBy().agg(*aggs)

    def hist_fields(i: int, c: str) -> str:
        if bins > 0:
            lo, hi = int(ranges[c][0]), int(ranges[c][1])
            return (
                f" 'h_lo', CAST({lo} AS BIGINT),"
                f" 'h_span', CAST({hi - lo + 1} AS BIGINT),"
                f" 'hist', _hist{i}"
            )
        return (
            " 'h_lo', CAST(NULL AS BIGINT),"
            " 'h_span', CAST(NULL AS BIGINT),"
            " 'hist', CAST(NULL AS ARRAY<BIGINT>)"
        )

    structs = ", ".join(
        f"named_struct('column', '{c}', 'n', _n{i}, 'n_null', _total - _n{i},"
        f" 'mn', _mn{i}, 'mx', _mx{i}, 'dsum', _s{i}, 'dssq', _q{i},"
        f" 'hll', _h{i},{hist_fields(i, c)})"
        for i, c in enumerate(cols)
    )
    return one.select(
        F.explode(F.expr(f"array({structs})")).alias("_s")
    ).select("_s.*")


def profile_from_approx_shards(
    shards: Sequence[DataFrame],
    cols: Sequence[str],
    quantiles: Sequence[float] = (),
) -> DataFrame:
    """Merge approx artifacts (counts/sums add, min/max combine,
    sketches ``hll_union_agg``, fixed-bin histograms element-wise
    add) and finish the same 8 stats — (column, stat, value) long
    frame, every stat except n_distinct bit-equal to
    ``profile_columns`` on the union of the shards (shared
    finishers). Merging is associative; artifacts survive parquet
    (the sketch is a plain binary column, the histogram a plain
    bigint list).

    ``quantiles`` (round 10): nearest-rank quantile ESTIMATES from
    the merged fixed-bin histograms — requires the shards to have
    been built with ``profile_shard_approx(bins=B, ranges=…)`` and
    IDENTICAL (lo, span) per column (validated here). The emitted
    value is the lowest micro value of the bin containing the
    nearest-rank element (all-integer: ``lo + ceil(idx·span/B)``),
    so the error vs the exact nearest-rank quantile is bounded by
    the bin width ``ceil(span/B)`` whenever the declared range
    covers the data. Deterministic and oracle-replayable — no
    sketch estimation is involved, only exact merged bin counts."""
    if not shards:
        raise ValueError("profile_from_approx_shards needs >= 1 shard")
    merged = shards[0]
    for s in shards[1:]:
        merged = merged.unionByName(s)
    has_hist = "hist" in merged.columns
    if quantiles and not has_hist:
        raise ValueError(
            "quantiles need histogram-bearing artifacts — build shards "
            "with profile_shard_approx(bins=B, ranges=...)"
        )
    aggs = [
        F.expr("CAST(sum(n) AS BIGINT)").alias("n"),
        F.expr("CAST(sum(n_null) AS BIGINT)").alias("n_null"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        F.expr("CAST(sum(dsum) AS DECIMAL(38,0))").alias("dsum"),
        F.expr("CAST(sum(dssq) AS DECIMAL(38,0))").alias("dssq"),
        F.expr(
            "CASE WHEN count(hll) > 0 THEN"
            " hll_sketch_estimate(hll_union_agg(hll))"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("nd"),
    ]
    if quantiles:
        aggs += [
            F.min("h_lo").alias("h_lo"),
            F.max("h_lo").alias("h_lo2"),
            F.min("h_span").alias("h_span"),
            F.max("h_span").alias("h_span2"),
            # element-wise bin-count sum — exact counts of the union
            F.expr(
                "aggregate(collect_list(hist), "
                "transform(try_element_at(collect_list(hist), 1), x -> CAST(0 AS BIGINT)), "
                "(acc, x) -> zip_with(acc, x, (a, b) -> a + b))"
            ).alias("hist"),
        ]
    agg = merged.groupBy("column").agg(*aggs)
    by_col = {r["column"]: r for r in agg.collect()}
    rows: List[tuple] = []
    for c in cols:
        r = by_col.get(c)
        if r is None:
            continue
        n = int(r["n"])
        vals = _finish_approx_stats(
            n=n,
            total=n + int(r["n_null"]),
            dsum=None if r["dsum"] is None else int(r["dsum"]),
            dssq=None if r["dssq"] is None else int(r["dssq"]),
            mn=r["mn"],
            mx=r["mx"],
            nd=0 if n == 0 else int(r["nd"]),
        )
        rows.extend((c, s, vals[s]) for s in STAT_NAMES)
        if quantiles and n > 0:
            if r["h_lo"] is None or r["hist"] is None:
                raise ValueError(
                    f"column {c!r}: artifacts carry no histogram — "
                    "rebuild shards with bins > 0"
                )
            if r["h_lo"] != r["h_lo2"] or r["h_span"] != r["h_span2"]:
                raise ValueError(
                    f"column {c!r}: shard histograms disagree on "
                    "(lo, span) — all shards must bin over the same "
                    "declared range"
                )
            rows.extend(
                _hist_quantile_rows(
                    c, quantiles, n, int(r["h_lo"]), int(r["h_span"]),
                    [int(x) for x in r["hist"]],
                )
            )
    spark = merged.sparkSession
    return spark.createDataFrame(
        rows, "column string, stat string, value bigint"
    )


def _hist_quantile_rows(
    col: str,
    quantiles: Sequence[float],
    n: int,
    lo: int,
    span: int,
    hist: List[int],
) -> List[tuple]:
    """(column, pXX, value) estimates from exact merged bin counts —
    the identical all-integer arithmetic the DuckDB oracle replays
    (``approx_shard_quantiles_oracle_sql``): nearest-rank index via
    _rank_sql's IEEE multiply, cumulative bin counts, bin lower edge
    ``lo + ceil(idx·span/bins)``."""
    import math

    bins = len(hist)
    out: List[tuple] = []
    for q in quantiles:
        rank = max(1, math.ceil(float(q) * float(n)))
        cum = 0
        idx = bins - 1
        for b, cnt in enumerate(hist):
            cum += cnt
            if cum >= rank:
                idx = b
                break
        edge = lo + (idx * span + bins - 1) // bins
        out.append((col, _q_stat_name(float(q)), edge))
    return out


def approx_shard_quantiles_oracle_sql(
    table: str,
    cols: Sequence[str],
    bins: int,
    quantiles: Sequence[float],
    where: str = "TRUE",
) -> str:
    """DuckDB replay of the approx-shard quantile path on the UNION of
    the shards (= ``table``): the same micro scaling, the same
    clamped integer bin spec over the column's (min, max) range, the
    same nearest-rank + bin-lower-edge arithmetic. Using min/max as
    the declared range matches a caller who ranges the shards from an
    exact profile of the same data."""
    legs = []
    for c in cols:
        mic = f"CAST(floor(CAST({c} AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
        rng = (
            f"(SELECT min({mic}) AS lo,"
            f" max({mic}) - min({mic}) + 1 AS span,"
            f" count({c}) AS n FROM {table} WHERE {where})"
        )
        bcnt = (
            f"(SELECT LEAST(GREATEST(({mic} - r.lo) * {bins} // r.span,"
            f" 0), {bins - 1}) AS idx, CAST(count(*) AS BIGINT) AS cnt"
            f" FROM {table}, {rng} r"
            f" WHERE {where} AND {c} IS NOT NULL GROUP BY 1)"
        )
        for q in quantiles:
            rank = _rank_sql(float(q), "r.n")
            legs.append(
                f"""
SELECT '{c}' AS "column", '{_q_stat_name(float(q))}' AS stat,
       r.lo + (qi.idx * r.span + {bins} - 1) // {bins} AS value
FROM {rng} r, LATERAL (
  SELECT min(idx) AS idx FROM (
    SELECT idx, sum(cnt) OVER (ORDER BY idx) AS cum FROM {bcnt}
  ) WHERE cum >= {rank}
) qi
WHERE r.n > 0"""
            )
    return " UNION ALL ".join(legs)


def profile_categorical(
    df: DataFrame, cols: Sequence[str], top: int = 10
) -> DataFrame:
    """Categorical companion to the numeric profiler: per STRING (or
    any castable) column, the ``top`` most frequent values with
    counts and ranks, plus the column's total distinct count repeated
    on every row — the facts an IN-set / enum DQ rule is authored
    from. NULL counts ride a NULL-value row (rank-eligible: a
    mostly-null column should SHOW null as its top value).

    Determinism: rank = row_number over (cnt DESC, value ASC NULLS
    FIRST) — a total order both engines implement identically, so the
    emitted top-k set and ranks are oracle-replayable exactly.

    100 TB: one posexplode scan → one combinable groupBy(column,
    value) → exact two-phase top-k over the count table. Round 13
    (optimization): the single per-column window put EVERY distinct
    value of a column in one task (fine for true enums, the guide
    §2.5 straggler shape for high-cardinality columns — dates, hosts,
    languages×region at corpus scale), and the former full-partition
    n_distinct window shipped the whole distinct set through a second
    windowed pass. Phase 1 ranks within deterministic hash-salt
    groups (any global top-k row ranks ≤ top inside its salt group —
    the global total order restricted to a subset preserves relative
    order — so phase 1 keeps a superset, ≤ 32·top rows per column);
    phase 2 is the identical total-order window over only those
    candidates, where every row ABOVE a surviving row is itself a
    survivor, so ranks are unchanged. n_distinct is now a plain
    combinable aggregate broadcast back (|cols| rows). Output is
    |cols| × top rows — metadata; result bit-identical to the
    single-window form (regression-pinned)."""
    names = F.array(*[F.lit(c) for c in cols])
    vals = [F.col(c).cast("string") for c in cols]
    counts = (
        df.select(F.posexplode(F.array(*vals)).alias("_cidx", "value"))
        .groupBy("_cidx", "value")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    from pyspark.sql import Window

    order = [F.col("cnt").desc(), F.col("value").asc_nulls_first()]
    # deterministic salt (guide §2.5 — never rand(): task retries must
    # reproduce the same row→group assignment); xxhash64(NULL) is the
    # fixed seed value, so the NULL-value row lands in one fixed group
    w1 = Window.partitionBy("_cidx", "_salt").orderBy(*order)
    cand = (
        counts.withColumn(
            "_salt", F.expr("pmod(xxhash64(value), 32)")
        )
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= int(top))
        .drop("_salt", "_r1")
    )
    nd = counts.groupBy("_cidx").agg(
        F.sum(F.when(F.col("value").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_distinct")
    )
    w = Window.partitionBy("_cidx").orderBy(*order)
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= int(top))
        .join(F.broadcast(nd), "_cidx")
        .select(
            F.element_at(names, F.col("_cidx") + 1).alias("column"),
            "value",
            "cnt",
            "rank",
            "n_distinct",
        )
    )


def profile_categorical_oracle_sql(
    table: str, cols: Sequence[str], top: int = 10
) -> str:
    """DuckDB replay — same count, same (cnt DESC, value ASC NULLS
    FIRST) rank order, same non-null distinct total."""
    legs = []
    for c in cols:
        legs.append(
            f"""
SELECT '{c}' AS "column", value, cnt, rank, n_distinct FROM (
  SELECT value, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC,
                                 value ASC NULLS FIRST) AS INT) AS rank,
         CAST(sum(CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END)
              OVER () AS BIGINT) AS n_distinct
  FROM (SELECT CAST({c} AS VARCHAR) AS value,
               CAST(count(*) AS BIGINT) AS cnt
        FROM {table} GROUP BY 1)
) WHERE rank <= {int(top)}"""
        )
    return "\nUNION ALL\n".join(legs)


# ---------------------------------------------------------------------------
# drift (round 9)
# ---------------------------------------------------------------------------

#: metrics emitted by profile_drift, in output order
DRIFT_METRICS = (
    "n_ratio_ppm",
    "null_rate_delta_ppm",
    "mean_delta",
    "std_ratio_ppm",
    "min_delta",
    "max_delta",
    "distinct_ratio_ppm",
    "range_breach",
)


def profile_drift(baseline: DataFrame, current: DataFrame) -> DataFrame:
    """Data-drift report between two profiles (the monitoring use the
    mergeable shard artifacts exist for: profile each day's batch at
    landing time, then diff today against yesterday — or against the
    merged history — WITHOUT touching the data again).

    Input: two long (column, stat, value) profile frames
    (``profile_columns`` / ``profile_from_shards`` output, live or
    read back from parquet). Output: (column, metric, value BIGINT),
    one row per column × ``DRIFT_METRICS``:

    - ``n_ratio_ppm``        — current/baseline row count, ppm
    - ``null_rate_delta_ppm``— null-rate change, ppm of total rows
    - ``mean_delta``         — mean shift, micro units
    - ``std_ratio_ppm``      — spread change, ppm (NULL if baseline
                                std is NULL/0)
    - ``min_delta``/``max_delta`` — range drift, micro units
    - ``distinct_ratio_ppm`` — cardinality change, ppm
    - ``range_breach``       — 1 iff current min undercuts or max
                                exceeds the baseline range (new
                                out-of-range values vs baseline — the
                                signal that a suggested range rule
                                would now fail), else 0

    INTEGER-EXACT: every ratio divides non-negative integers
    (floor == truncate, so a SQL replay with DIV agrees bit-for-bit);
    deltas are exact integer subtraction; NULL propagates where a
    side is missing. Profiles are metadata-sized, so both are
    collected and the result is a literal frame."""
    a = _drift_stat_map(baseline.collect())
    b = _drift_stat_map(current.collect())
    rows: List[tuple] = []
    for c in sorted(set(a) | set(b)):
        sa, sb = a.get(c, {}), b.get(c, {})
        vals = _drift_metrics(sa, sb)
        rows.extend((c, m, vals[m]) for m in DRIFT_METRICS)
    spark = baseline.sparkSession
    return spark.createDataFrame(
        rows, "column string, metric string, value bigint"
    )


def _drift_stat_map(rows) -> Dict[str, Dict[str, int]]:
    out: Dict[str, Dict[str, int]] = {}
    for r in rows:
        out.setdefault(r["column"], {})[r["stat"]] = r["value"]
    return out


def _drift_metrics(sa: Dict[str, int], sb: Dict[str, int]) -> Dict[str, int]:
    def ratio_ppm(x, y):  # y_current vs x_baseline, both non-negative
        if x is None or y is None or x <= 0:
            return None
        return (int(y) * 1_000_000) // int(x)

    def null_rate(s):
        n, nn = s.get("n"), s.get("n_null")
        if n is None or nn is None or (n + nn) <= 0:
            return None
        return (int(nn) * 1_000_000) // int(n + nn)

    def delta(x, y):
        if x is None or y is None:
            return None
        return int(y) - int(x)

    ra, rb = null_rate(sa), null_rate(sb)
    mn_a, mn_b = sa.get("min"), sb.get("min")
    mx_a, mx_b = sa.get("max"), sb.get("max")
    breach = int(
        (mn_b is not None and (mn_a is None or mn_b < mn_a))
        or (mx_b is not None and (mx_a is None or mx_b > mx_a))
    )
    return {
        "n_ratio_ppm": ratio_ppm(sa.get("n"), sb.get("n")),
        "null_rate_delta_ppm": delta(ra, rb),
        "mean_delta": delta(sa.get("mean"), sb.get("mean")),
        "std_ratio_ppm": ratio_ppm(sa.get("std"), sb.get("std")),
        "min_delta": delta(mn_a, mn_b),
        "max_delta": delta(mx_a, mx_b),
        "distinct_ratio_ppm": ratio_ppm(
            sa.get("n_distinct"), sb.get("n_distinct")
        ),
        "range_breach": breach,
    }


def profile_psi(
    baseline_shards: Sequence[DataFrame],
    current_shards: Sequence[DataFrame],
    cols: Sequence[str],
) -> DataFrame:
    """Population Stability Index between two shard populations — the
    distributional significance score ``profile_drift``'s per-stat
    deltas lack (VERDICT r09 next #6). Inputs are histogram-bearing
    approx artifacts (``profile_shard_approx(bins=B, ranges=…)``)
    with IDENTICAL (lo, span) per column on both sides — fixed
    caller-declared ranges are what make the two histograms
    comparable bin-for-bin (exact profiles bin against their own
    min/max and cannot be PSI'd against each other). Each side may be
    multiple shards; their bin counts merge by exact addition first.

    PSI = Σ_bins (p_cur − p_base) · ln(p_cur / p_base), with
    LAPLACE-SMOOTHED proportions p = (cnt + 1) / (n + B) on both
    sides — the documented empty-bin handling: no bin is ever zero,
    so the log is always finite, and identically-distributed sides
    still score ~0. Emitted micro-scaled
    (``floor(psi·1e6 + 0.5)``) as (column, metric='psi_micro',
    value BIGINT) plus the two sides' non-null counts
    (``n_base``/``n_cur``) for context.

    Bit-exact replay: proportions are IEEE divisions of exact
    integers, the log is the platform libm ``log`` in BOTH engines
    (CPython ``math.log`` here, DuckDB ``ln`` in the oracle), and the
    sum folds in ascending bin order on both sides
    (``list_reduce`` in the oracle, a left fold here) — so the gate
    compares the double bit-for-bit through the micro scaling.
    Rule of thumb: PSI < 0.1 (100000 micro) stable, 0.1-0.25
    moderate shift, > 0.25 action."""
    import math

    def side(shards, tag):
        merged = shards[0]
        for s in shards[1:]:
            merged = merged.unionByName(s)
        agg = merged.groupBy("column").agg(
            F.expr("CAST(sum(n) AS BIGINT)").alias("n"),
            F.min("h_lo").alias("h_lo"),
            F.max("h_lo").alias("h_lo2"),
            F.min("h_span").alias("h_span"),
            F.max("h_span").alias("h_span2"),
            F.expr(
                "aggregate(collect_list(hist), "
                "transform(try_element_at(collect_list(hist), 1), x -> CAST(0 AS BIGINT)), "
                "(acc, x) -> zip_with(acc, x, (a, b) -> a + b))"
            ).alias("hist"),
        )
        out = {}
        for r in agg.collect():
            if r["hist"] is None:
                raise ValueError(
                    f"{tag} artifacts for column {r['column']!r} carry "
                    "no histogram — build with bins > 0"
                )
            if r["h_lo"] != r["h_lo2"] or r["h_span"] != r["h_span2"]:
                raise ValueError(
                    f"{tag} shards disagree on (lo, span) for column "
                    f"{r['column']!r}"
                )
            out[r["column"]] = (
                int(r["n"]), int(r["h_lo"]), int(r["h_span"]),
                [int(x) for x in r["hist"]],
            )
        return out

    a, b = side(baseline_shards, "baseline"), side(current_shards, "current")
    rows: List[tuple] = []
    for c in cols:
        if c not in a or c not in b:
            continue
        na, lo_a, sp_a, ha = a[c]
        nb, lo_b, sp_b, hb = b[c]
        if (lo_a, sp_a, len(ha)) != (lo_b, sp_b, len(hb)):
            raise ValueError(
                f"column {c!r}: baseline and current histograms have "
                "different (lo, span, bins) — both sides must be built "
                "over the same declared range and bin count"
            )
        bins = len(ha)
        psi = 0.0
        for i in range(bins):
            pa = (ha[i] + 1) / float(na + bins)
            pb = (hb[i] + 1) / float(nb + bins)
            psi += (pb - pa) * math.log(pb / pa)
        rows.append((c, "psi_micro", int(math.floor(psi * 1e6 + 0.5))))
        rows.append((c, "n_base", na))
        rows.append((c, "n_cur", nb))
    spark = baseline_shards[0].sparkSession
    return spark.createDataFrame(
        rows, "column string, metric string, value bigint"
    )


def categorical_psi(
    baseline: DataFrame,
    current: DataFrame,
    cols: Sequence[str],
    max_card: int = 10_000,
) -> DataFrame:
    """PSI over CATEGORICAL value distributions — the companion of
    :func:`profile_psi` for string/enum columns, where fixed-bin
    histograms don't apply. Per column: full value-frequency tables
    on both sides (one combinable groupBy each — NULL counts as its
    own category), Laplace-smoothed proportions over the UNION value
    domain (so a value absent from one side contributes a finite,
    smoothed term — the documented empty-category handling), and the
    PSI sum folded in ascending value order (NULL first; UTF-8
    codepoint order — identical in Spark, DuckDB's binary collation,
    and Python). Emitted micro-scaled alongside the two sides'
    row counts and the union-domain size.

    ``max_card`` guards the driver collect (the joined frequency
    table is |union domain| rows per column): a column whose union
    domain exceeds it raises — use the numeric fixed-bin path (or a
    hashed bucketing) for high-cardinality columns instead of
    silently collecting a data-sized table.

    Round 14 (performance; identical output): ONE job for all columns
    and both sides — each side's per-column value counts come from a
    single posexplode pass (null elements explode to the NULL
    category), tagged and re-added in one groupBy, instead of a
    sequential (2 scans + full-outer join + collect) job PER column.
    The per-column driver guard survives as a row_number cap over the
    aggregated (domain-sized, never data-sized) table, raising on the
    same ``> max_card`` condition. The counts are the same integers
    and the fold below is the same Python arithmetic, so every emitted
    value is bit-identical."""
    import math

    from pyspark.sql import Window

    spark = baseline.sparkSession

    def side_counts(df, tag):
        arr = F.array(*[F.col(c).cast("string") for c in cols])
        return (
            df.select(F.posexplode_outer(arr).alias("_ci", "v"))
            .groupBy("_ci", "v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .select("_ci", "v", F.lit(tag).alias("_t"), "cnt")
        )

    both = (
        side_counts(baseline, "a")
        .unionByName(side_counts(current, "b"))
        .groupBy("_ci", "v")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("_t") == "a", F.col("cnt"))), F.lit(0)
            ).cast("bigint").alias("ca"),
            F.coalesce(
                F.sum(F.when(F.col("_t") == "b", F.col("cnt"))), F.lit(0)
            ).cast("bigint").alias("cb"),
        )
    )
    w = Window.partitionBy("_ci").orderBy(F.col("v").asc_nulls_first())
    capped = both.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= int(max_card) + 1
    )
    by_col: Dict[int, list] = {}
    for r in capped.collect():
        by_col.setdefault(int(r["_ci"]), []).append(
            (r["v"], int(r["ca"]), int(r["cb"]))
        )
    rows: List[tuple] = []
    for ci, c in enumerate(cols):
        vals = by_col.get(ci, [])
        if len(vals) > int(max_card):
            raise ValueError(
                f"column {c!r}: union value domain exceeds max_card="
                f"{max_card} — categorical PSI would collect a "
                "data-sized table; bucket or use the fixed-bin path"
            )
        # ascending value order, NULL first — matches the oracle's
        # ORDER BY v NULLS FIRST under binary/UTF-8 collation
        ordered = sorted(
            vals, key=lambda t: (t[0] is not None, t[0])
        )
        na = sum(t[1] for t in ordered)
        nb = sum(t[2] for t in ordered)
        dom = len(ordered)
        psi = 0.0
        for _, ca, cb in ordered:
            pa = (ca + 1) / float(na + dom)
            pb = (cb + 1) / float(nb + dom)
            psi += (pb - pa) * math.log(pb / pa)
        rows.append((c, "psi_micro", int(math.floor(psi * 1e6 + 0.5))))
        rows.append((c, "n_base", na))
        rows.append((c, "n_cur", nb))
        rows.append((c, "n_values", dom))
    return spark.createDataFrame(
        rows, "column string, metric string, value bigint"
    )


def categorical_psi_oracle_sql(
    table_a: str,
    table_b: str,
    cols: Sequence[str],
) -> str:
    """DuckDB replay of :func:`categorical_psi`: same per-side
    frequency tables, same union domain + Laplace smoothing, platform
    ``ln``, and an ascending-value (NULLS FIRST) ``list_reduce`` left
    fold matching the python loop order exactly."""
    legs = []
    for c in cols:
        j = (
            f"(SELECT COALESCE(a.v, b.v) AS v,"
            f" COALESCE(a.ca, 0) AS ca, COALESCE(b.cb, 0) AS cb"
            f" FROM (SELECT CAST({c} AS VARCHAR) AS v,"
            f"       CAST(count(*) AS BIGINT) AS ca FROM {table_a}"
            f"       GROUP BY 1) a"
            f" FULL OUTER JOIN"
            f"      (SELECT CAST({c} AS VARCHAR) AS v,"
            f"       CAST(count(*) AS BIGINT) AS cb FROM {table_b}"
            f"       GROUP BY 1) b"
            f" ON a.v IS NOT DISTINCT FROM b.v)"
        )
        term = (
            "((CAST(t.cb + 1 AS DOUBLE) / CAST(s.nb + s.dom AS DOUBLE))"
            " - (CAST(t.ca + 1 AS DOUBLE) / CAST(s.na + s.dom AS DOUBLE)))"
            " * ln((CAST(t.cb + 1 AS DOUBLE) / CAST(s.nb + s.dom AS DOUBLE))"
            " / (CAST(t.ca + 1 AS DOUBLE) / CAST(s.na + s.dom AS DOUBLE)))"
        )
        legs.append(
            f"""
SELECT '{c}' AS "column", m.metric, m.value
FROM (
  SELECT CAST(floor(list_reduce(
           list_prepend(CAST(0 AS DOUBLE), terms), (x, y) -> x + y
         ) * 1000000 + 0.5) AS BIGINT) AS psi,
         CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
         CAST(dom AS BIGINT) AS dom
  FROM (
    SELECT list({term} ORDER BY t.v NULLS FIRST) AS terms,
           max(s.na) AS na, max(s.nb) AS nb, max(s.dom) AS dom
    FROM {j} t,
         (SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS dom
          FROM {j}) s
  )
), LATERAL (VALUES
  ('psi_micro', psi), ('n_base', na), ('n_cur', nb), ('n_values', dom)
) AS m(metric, value)"""
        )
    return " UNION ALL ".join(legs)


def profile_psi_oracle_sql(
    table_a: str,
    table_b: str,
    range_table: str,
    cols: Sequence[str],
    bins: int,
) -> str:
    """DuckDB replay of :func:`profile_psi` from the RAW tables: the
    same micro scaling, the same clamped bin spec over the declared
    range (min/max of ``range_table`` — matching a caller who ranges
    both sides from one exact profile), the same Laplace smoothing,
    platform ``ln``, and an ascending-bin ``list_reduce`` left fold
    so the double sum is order-identical to the python loop."""
    legs = []
    for c in cols:
        mic = f"CAST(floor(CAST({c} AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
        rng = (
            f"(SELECT min({mic}) AS lo,"
            f" max({mic}) - min({mic}) + 1 AS span FROM {range_table})"
        )

        def cnts(table: str) -> str:
            return (
                f"(SELECT b.i AS idx, COALESCE(h.cnt, 0) AS cnt,"
                f" (SELECT count({c}) FROM {table}) AS n"
                f" FROM (SELECT CAST(range AS INT) AS i FROM range({bins})) b"
                f" LEFT JOIN ("
                f"   SELECT LEAST(GREATEST(({mic} - r.lo) * {bins} // r.span,"
                f" 0), {bins - 1}) AS i, CAST(count(*) AS BIGINT) AS cnt"
                f"   FROM {table}, {rng} r WHERE {c} IS NOT NULL GROUP BY 1"
                f" ) h ON h.i = b.i)"
            )

        term = (
            "((CAST(t.cb + 1 AS DOUBLE) / CAST(t.nb + {B} AS DOUBLE))"
            " - (CAST(t.ca + 1 AS DOUBLE) / CAST(t.na + {B} AS DOUBLE)))"
            " * ln((CAST(t.cb + 1 AS DOUBLE) / CAST(t.nb + {B} AS DOUBLE))"
            " / (CAST(t.ca + 1 AS DOUBLE) / CAST(t.na + {B} AS DOUBLE)))"
        ).format(B=bins)
        legs.append(
            f"""
SELECT '{c}' AS "column", m.metric, m.value
FROM (
  SELECT CAST(floor(list_reduce(
           list_prepend(CAST(0 AS DOUBLE), terms), (x, y) -> x + y
         ) * 1000000 + 0.5) AS BIGINT) AS psi,
         CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb
  FROM (
    SELECT list({term} ORDER BY t.idx) AS terms,
           max(t.na) AS na, max(t.nb) AS nb
    FROM (
      SELECT a.idx, a.cnt AS ca, a.n AS na, b.cnt AS cb, b.n AS nb
      FROM {cnts(table_a)} a JOIN {cnts(table_b)} b ON a.idx = b.idx
    ) t
  )
), LATERAL (VALUES
  ('psi_micro', psi), ('n_base', na), ('n_cur', nb)
) AS m(metric, value)"""
        )
    return " UNION ALL ".join(legs)


def profile_drift_oracle_sql(
    baseline_profile_sql: str, current_profile_sql: str
) -> str:
    """DuckDB replay of ``profile_drift`` from two profile subqueries
    — same pivots, same non-negative integer divisions (// == the
    Python floor on this domain), same NULL propagation."""
    piv = """
  SELECT "column" AS col,
    MAX(CASE WHEN stat = 'n' THEN value END) AS n,
    MAX(CASE WHEN stat = 'n_null' THEN value END) AS n_null,
    MAX(CASE WHEN stat = 'n_distinct' THEN value END) AS dist,
    MAX(CASE WHEN stat = 'mean' THEN value END) AS mean,
    MAX(CASE WHEN stat = 'std' THEN value END) AS std,
    MAX(CASE WHEN stat = 'min' THEN value END) AS mn,
    MAX(CASE WHEN stat = 'max' THEN value END) AS mx
  FROM {src} GROUP BY 1
"""
    return f"""
WITH a AS ({piv.format(src=f"({baseline_profile_sql})")}),
b AS ({piv.format(src=f"({current_profile_sql})")}),
j AS (
  SELECT COALESCE(a.col, b.col) AS col,
         a.n AS n_a, a.n_null AS nn_a, a.dist AS d_a, a.mean AS me_a,
         a.std AS sd_a, a.mn AS mn_a, a.mx AS mx_a,
         b.n AS n_b, b.n_null AS nn_b, b.dist AS d_b, b.mean AS me_b,
         b.std AS sd_b, b.mn AS mn_b, b.mx AS mx_b
  FROM a FULL OUTER JOIN b ON a.col = b.col
), m AS (
  SELECT col,
    CASE WHEN n_a > 0 THEN (n_b * 1000000) // n_a END AS n_ratio_ppm,
    (CASE WHEN n_b + nn_b > 0
          THEN (nn_b * 1000000) // (n_b + nn_b) END)
    - (CASE WHEN n_a + nn_a > 0
            THEN (nn_a * 1000000) // (n_a + nn_a) END)
      AS null_rate_delta_ppm,
    me_b - me_a AS mean_delta,
    CASE WHEN sd_a > 0 THEN (sd_b * 1000000) // sd_a END AS std_ratio_ppm,
    mn_b - mn_a AS min_delta,
    mx_b - mx_a AS max_delta,
    CASE WHEN d_a > 0 THEN (d_b * 1000000) // d_a END AS distinct_ratio_ppm,
    CAST((mn_b IS NOT NULL AND (mn_a IS NULL OR mn_b < mn_a))
      OR (mx_b IS NOT NULL AND (mx_a IS NULL OR mx_b > mx_a))
      AS BIGINT) AS range_breach
  FROM j
)
SELECT col AS "column", u.metric, u.value FROM m, LATERAL (VALUES
  ('n_ratio_ppm', n_ratio_ppm),
  ('null_rate_delta_ppm', null_rate_delta_ppm),
  ('mean_delta', mean_delta),
  ('std_ratio_ppm', std_ratio_ppm),
  ('min_delta', min_delta),
  ('max_delta', max_delta),
  ('distinct_ratio_ppm', distinct_ratio_ppm),
  ('range_breach', range_breach)
) AS u(metric, value)
"""


# ---------------------------------------------------------------------------
# oracle
# ---------------------------------------------------------------------------


def profile_oracle_sql(
    table: str,
    cols: Sequence[str],
    bins: int = 8,
    where: str = "TRUE",
    quantiles: Sequence[float] = (),
) -> str:
    """DuckDB replay of :func:`profile_columns` — the same micro
    scaling, DECIMAL(38,0) internals, integer division, and
    floor(sqrt(double)) finisher. The histogram min/max come from a
    scalar subquery instead of a collect (same values by
    construction); quantiles replay the nearest-rank cumulative-count
    definition with the identical IEEE rank arithmetic (_rank_sql)."""
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
            f"CASE WHEN {n} > 1 AND {_std_safe_sql(ssum, ssq, n)} "
            f"THEN CAST(floor(sqrt("
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
         {_clamped_sum_sql(ssum)} AS a_sum,
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
) h ON h.i = b.i
WHERE (SELECT count({c}) FROM {table} WHERE {where}) > 0"""
        )
        for q in quantiles:
            rank = _rank_sql(
                float(q),
                f"(SELECT count({c}) FROM {table} WHERE {where})",
            )
            legs.append(
                f"""
SELECT '{c}' AS "column", '{_q_stat_name(float(q))}' AS stat,
       (SELECT min(mic) FROM (
          SELECT mic, sum(cnt) OVER (ORDER BY mic) AS cum FROM (
            SELECT {mic} AS mic, CAST(count(*) AS BIGINT) AS cnt
            FROM {table} WHERE {where} AND {c} IS NOT NULL GROUP BY 1
          )
        ) WHERE cum >= {rank}) AS value
WHERE (SELECT count({c}) FROM {table} WHERE {where}) > 0"""
            )
    return " UNION ALL ".join(legs)
