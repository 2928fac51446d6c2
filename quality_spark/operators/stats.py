"""Cross-column statistical profiling — exact correlation, categorical
association, entropy — the DQ facts that sit one level above the
per-column profiler (`operators/profile.py`): "are these two columns
redundant / drifting together / independent?".

The reference engine has no statistics operators; this extends the
rebuilt surface's beyond-reference DQ block (SURVEY §2). Design rules
shared with the profiler:

- **Integer-exact accumulation.** Numeric values enter as micros
  (``floor(x*1e6 + 0.5)`` — the profiler's spec), all sums/products
  accumulate in DECIMAL(38,0) on Spark and HUGEINT in the DuckDB
  oracle, so no engine can diverge before the final finisher.
- **Deterministic doubles.** Every emitted double is a fixed-order
  IEEE expression over exact integers (casts, one division, sqrt) or
  an ascending-key left fold (the bm25/PSI pattern) — bit-replayable.
- **One aggregate per fact.** Correlations for ALL requested pairs
  come from ONE full-scan aggregate (combinable, map-side partial);
  association/entropy group only on category values (bounded by the
  column's cardinality — these are categorical-column facts, like
  `profile_categorical`).

100 TB headroom: with |micros| <= M and n rows, the largest exact
term is n * M^2 < 10^38 — e.g. 10^10 rows at M = 10^9 (values up to
~1000 in magnitude at micro precision). Past that, center values
first (subtract a per-column anchor before the micro cast); the
formulas are translation-invariant.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mic(col: str) -> str:
    """The profiler's micro spec: round-half-up to 1e-6."""
    return f"CAST(floor(CAST({col} AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# Pearson correlation matrix (exact integer accumulation)
# ---------------------------------------------------------------------------


def _corr_pair_aggs(x: str, y: str, tag: str) -> list:
    """Per-pair accumulator expressions over the PROJECTED mic
    columns (``_m_<col>`` — computed once per column in a projection
    below the aggregate; inlining the floor/cast into all 36
    aggregate expressions re-evaluated it per reference and pushed
    the aggregate past the codegen field budget). A mic is NULL iff
    its source is NULL, so the pair's complete-rows mask is the two
    mic nullity tests (pairwise deletion — each pair sees its own
    complete rows)."""
    both = f"(_m_{x} IS NOT NULL AND _m_{y} IS NOT NULL)"
    xm = f"CASE WHEN {both} THEN CAST(_m_{x} AS DECIMAL(38,0)) END"
    ym = f"CASE WHEN {both} THEN CAST(_m_{y} AS DECIMAL(38,0)) END"
    return [
        F.expr(f"CAST(count_if({both}) AS BIGINT)").alias(f"n_{tag}"),
        F.expr(f"CAST(coalesce(sum({xm}), 0) AS DECIMAL(38,0))").alias(f"sx_{tag}"),
        F.expr(f"CAST(coalesce(sum({ym}), 0) AS DECIMAL(38,0))").alias(f"sy_{tag}"),
        F.expr(
            f"CAST(coalesce(sum(({xm}) * ({ym})), 0) AS DECIMAL(38,0))"
        ).alias(f"sxy_{tag}"),
        F.expr(
            f"CAST(coalesce(sum(({xm}) * ({xm})), 0) AS DECIMAL(38,0))"
        ).alias(f"sxx_{tag}"),
        F.expr(
            f"CAST(coalesce(sum(({ym}) * ({ym})), 0) AS DECIMAL(38,0))"
        ).alias(f"syy_{tag}"),
    ]


def numeric_correlations(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Exact pairwise Pearson correlation over micro-quantized values.

    Returns (col_x, col_y, n_pairs, corr) for every unordered pair of
    ``cols`` (x < y in list order). ONE full-scan aggregate feeds all
    pairs (map-side combinable) over a per-column mic projection (each
    micro computed once per row, not once per referencing aggregate);
    the finisher is pure per-pair arithmetic on the 1-row result::

        corr = (n*Sxy - Sx*Sy)
               / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2))

    computed as IEEE doubles of the exact DECIMAL(38,0) integers in a
    fixed operation order, so the DuckDB oracle (HUGEINT accumulation,
    same finisher) replays the double bit-for-bit. Zero-variance /
    empty pairs yield corr NULL. The micro quantization is the
    documented precision contract (values compare at 1e-6), identical
    to `profile_columns`."""
    if len(cols) < 2:
        raise ValueError("numeric_correlations needs >= 2 columns")
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    aggs = []
    for t, (x, y) in enumerate(pairs):
        aggs.extend(_corr_pair_aggs(x, y, f"p{t}"))
    projected = df.select(
        *[F.expr(_mic(c)).alias(f"_m_{c}") for c in cols]
    )
    wide = projected.groupBy().agg(*aggs)
    return _corr_finish(wide, pairs)


def _corr_finish(wide: DataFrame, pairs) -> DataFrame:
    """Shared finisher over the 1-row accumulator frame — the inline
    and shard-merged paths both end here, so they cannot drift."""
    rows = []
    for t, (x, y) in enumerate(pairs):
        g = f"p{t}"
        num = f"CAST(n_{g} * sxy_{g} - sx_{g} * sy_{g} AS DOUBLE)"
        vx = f"CAST(n_{g} * sxx_{g} - sx_{g} * sx_{g} AS DOUBLE)"
        vy = f"CAST(n_{g} * syy_{g} - sy_{g} * sy_{g} AS DOUBLE)"
        rows.append(
            f"named_struct("
            f"'col_x', '{x}', 'col_y', '{y}', 'n_pairs', n_{g}, "
            f"'corr', CASE WHEN {vx} > 0.0D AND {vy} > 0.0D "
            f"THEN {num} / (sqrt({vx}) * sqrt({vy})) END)"
        )
    return wide.select(
        F.explode(F.expr("array(" + ", ".join(rows) + ")")).alias("_r")
    ).select("_r.col_x", "_r.col_y", "_r.n_pairs", "_r.corr")


def corr_shard(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """The MERGEABLE correlation artifact — one row holding every
    pair's exact accumulators (n, Sx, Sy, Sxy, Sxx, Syy in
    DECIMAL(38,0)) for this shard/batch. Correlation sums are
    associative, so per-day shards add into whole-history
    correlations without rescanning any batch (the profile-shard
    pattern: `corr_from_shards` merges by exact addition and finishes
    through the SAME finisher as `numeric_correlations` — bit-equal
    to profiling the union, test-pinned; artifacts survive parquet).
    One combinable full-scan aggregate per shard; KB-sized output."""
    if len(cols) < 2:
        raise ValueError("corr_shard needs >= 2 columns")
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    aggs = []
    for t, (x, y) in enumerate(pairs):
        aggs.extend(_corr_pair_aggs(x, y, f"p{t}"))
    projected = df.select(
        *[F.expr(_mic(c)).alias(f"_m_{c}") for c in cols]
    )
    return projected.groupBy().agg(*aggs)


def corr_from_shards(
    shards: Sequence[DataFrame], cols: Sequence[str]
) -> DataFrame:
    """Merge `corr_shard` artifacts (exact integer addition per
    accumulator) and finish — (col_x, col_y, n_pairs, corr) bit-equal
    to `numeric_correlations` over the union of the shards."""
    if not shards:
        raise ValueError("corr_from_shards needs >= 1 shard")
    if len(cols) < 2:
        raise ValueError("corr_from_shards needs >= 2 columns")
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    merged = shards[0]
    for s in shards[1:]:
        merged = merged.unionByName(s)
    aggs = []
    for t, _ in enumerate(pairs):
        g = f"p{t}"
        aggs.append(
            F.expr(f"CAST(coalesce(sum(n_{g}), 0) AS BIGINT)").alias(f"n_{g}")
        )
        for a in ("sx", "sy", "sxy", "sxx", "syy"):
            aggs.append(
                F.expr(
                    f"CAST(coalesce(sum({a}_{g}), 0) AS DECIMAL(38,0))"
                ).alias(f"{a}_{g}")
            )
    return _corr_finish(merged.groupBy().agg(*aggs), pairs)


def numeric_correlations_oracle_sql(table: str, cols: Sequence[str]) -> str:
    """DuckDB replay of :func:`numeric_correlations` — HUGEINT exact
    sums, identical finisher arithmetic and operation order."""
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    legs = []
    for x, y in pairs:
        both = f"({x} IS NOT NULL AND {y} IS NOT NULL)"
        xm = f"CASE WHEN {both} THEN CAST({_mic(x)} AS HUGEINT) END"
        ym = f"CASE WHEN {both} THEN CAST({_mic(y)} AS HUGEINT) END"
        legs.append(f"""
SELECT '{x}' AS col_x, '{y}' AS col_y, n AS n_pairs,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0.0
              AND CAST(n * syy - sy * sy AS DOUBLE) > 0.0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS corr
FROM (
  SELECT CAST(count(*) FILTER ({both}) AS BIGINT) AS n,
         COALESCE(sum({xm}), 0) AS sx, COALESCE(sum({ym}), 0) AS sy,
         COALESCE(sum(({xm}) * ({ym})), 0) AS sxy,
         COALESCE(sum(({xm}) * ({xm})), 0) AS sxx,
         COALESCE(sum(({ym}) * ({ym})), 0) AS syy
  FROM {table}
)""")
    return "\nUNION ALL\n".join(legs)


# ---------------------------------------------------------------------------
# Categorical association: chi-squared + Cramér's V
# ---------------------------------------------------------------------------


def categorical_association(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-squared independence statistic + Cramér's V between
    two CATEGORICAL columns (bounded cardinality, like
    `profile_categorical` — the contingency table is assumed
    metadata-sized; this is not a join operator).

    Rows where either column is NULL are excluded (n counts complete
    rows only — the standard test population, and it keeps the
    ascending-cell fold free of engine NULL-ordering differences).

    chi2 = sum_all_cells (O - E)^2 / E, computed WITHOUT materializing
    zero cells: for observed cells the term is
    ``(W*n_ij - r_i*c_j)^2 / (W*r_i*c_j) - r_i*c_j/W`` and the
    unobserved cells' total is recovered in closed form —
    ``sum_all r_i*c_j/W = W``, so chi2 = fold(observed terms) + W.
    Every intermediate is an exact DECIMAL(38,0)/HUGEINT integer; each
    cell contributes two IEEE divisions and one subtract in fixed
    order, and the sum folds in ascending (a, b) order —
    bit-replayable.

    V = sqrt(chi2 / (W * (min(R, C) - 1)))

    Returns one row: (col_a, col_b, n, n_cells, dof, chi2, cramers_v).
    Degenerate tables (single row/column) yield chi2 = 0.0 and
    cramers_v NULL."""
    base = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .select(
            F.col(col_a).cast("string").alias("_a"),
            F.col(col_b).cast("string").alias("_b"),
        )
    )
    cells = base.groupBy("_a", "_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("_nij")
    )
    ra = base.groupBy("_a").agg(F.count(F.lit(1)).cast("bigint").alias("_ri"))
    cb = base.groupBy("_b").agg(F.count(F.lit(1)).cast("bigint").alias("_cj"))
    tot = base.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("_w"))
    term = (
        "CAST("
        "(CAST(_w AS DECIMAL(38,0)) * _nij - CAST(_ri AS DECIMAL(38,0)) * _cj)"
        " * "
        "(CAST(_w AS DECIMAL(38,0)) * _nij - CAST(_ri AS DECIMAL(38,0)) * _cj)"
        " AS DOUBLE) / "
        "CAST(CAST(_w AS DECIMAL(38,0)) * _ri * _cj AS DOUBLE)"
        " - CAST(CAST(_ri AS DECIMAL(38,0)) * _cj AS DOUBLE)"
        " / CAST(_w AS DOUBLE)"
    )
    scored = (
        cells.join(ra, "_a")
        .join(cb, "_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "_a", "_b", "_w",
            F.expr(term).alias("_t"),
        )
    )
    agg = scored.groupBy().agg(
        F.max("_w").alias("_w"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.expr("CAST(count(DISTINCT _a) AS BIGINT)").alias("_nr"),
        F.expr("CAST(count(DISTINCT _b) AS BIGINT)").alias("_nc"),
        F.expr(
            "aggregate(sort_array(collect_list("
            "named_struct('a', _a, 'b', _b, 't', _t))), 0.0D, "
            "(acc, x) -> acc + x.t)"
        ).alias("_fold"),
    )
    return agg.select(
        F.lit(col_a).alias("col_a"),
        F.lit(col_b).alias("col_b"),
        F.coalesce(F.col("_w"), F.lit(0)).cast("bigint").alias("n"),
        F.col("n_cells"),
        F.expr(
            "CAST(greatest(_nr - 1, 0) * greatest(_nc - 1, 0) AS BIGINT)"
        ).alias("dof"),
        F.expr(
            "CASE WHEN _w IS NULL THEN 0.0D "
            "ELSE _fold + CAST(_w AS DOUBLE) END"
        ).alias("chi2"),
        F.expr(
            # greatest(…, 0): independence can leave chi2 a hair
            # negative from rounding; sqrt must not see it
            "CASE WHEN _w > 0 AND least(_nr, _nc) > 1 THEN "
            "sqrt(greatest(_fold + CAST(_w AS DOUBLE), 0.0D) "
            "/ (CAST(_w AS DOUBLE) "
            "* CAST(least(_nr, _nc) - 1 AS DOUBLE))) END"
        ).alias("cramers_v"),
    )


def categorical_association_oracle_sql(
    table: str, col_a: str, col_b: str
) -> str:
    """DuckDB replay of :func:`categorical_association` — HUGEINT cell
    terms, ascending (a, b) list_reduce left fold from 0.0."""
    return f"""
WITH base AS (
  SELECT CAST({col_a} AS VARCHAR) AS _a, CAST({col_b} AS VARCHAR) AS _b
  FROM {table}
  WHERE {col_a} IS NOT NULL AND {col_b} IS NOT NULL
),
cells AS (
  SELECT _a, _b, CAST(count(*) AS BIGINT) AS _nij FROM base GROUP BY 1, 2
),
ra AS (SELECT _a, CAST(count(*) AS BIGINT) AS _ri FROM base GROUP BY 1),
cb AS (SELECT _b, CAST(count(*) AS BIGINT) AS _cj FROM base GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS _w FROM base),
scored AS (
  SELECT c._a, c._b, t._w,
         CAST((CAST(t._w AS HUGEINT) * c._nij - CAST(r._ri AS HUGEINT) * b._cj)
              * (CAST(t._w AS HUGEINT) * c._nij - CAST(r._ri AS HUGEINT) * b._cj)
              AS DOUBLE)
         / CAST(CAST(t._w AS HUGEINT) * r._ri * b._cj AS DOUBLE)
         - CAST(CAST(r._ri AS HUGEINT) * b._cj AS DOUBLE)
           / CAST(t._w AS DOUBLE) AS _t
  FROM cells c JOIN ra r USING (_a) JOIN cb b USING (_b) CROSS JOIN tot t
),
agg AS (
  SELECT max(_w) AS _w, CAST(count(*) AS BIGINT) AS n_cells,
         CAST(count(DISTINCT _a) AS BIGINT) AS _nr,
         CAST(count(DISTINCT _b) AS BIGINT) AS _nc,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(_t ORDER BY _a, _b)), (x, y) -> x + y) AS _fold
  FROM scored
)
SELECT '{col_a}' AS col_a, '{col_b}' AS col_b,
       CAST(COALESCE(_w, 0) AS BIGINT) AS n, n_cells,
       CAST(greatest(_nr - 1, 0) * greatest(_nc - 1, 0) AS BIGINT) AS dof,
       CASE WHEN _w IS NULL THEN 0.0
            ELSE _fold + CAST(_w AS DOUBLE) END AS chi2,
       CASE WHEN _w > 0 AND least(_nr, _nc) > 1 THEN
         sqrt(greatest(_fold + CAST(_w AS DOUBLE), 0.0)
              / (CAST(_w AS DOUBLE) * CAST(least(_nr, _nc) - 1 AS DOUBLE)))
       END AS cramers_v
FROM agg
"""


# ---------------------------------------------------------------------------
# Shannon entropy over categorical columns
# ---------------------------------------------------------------------------


def categorical_entropy(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Shannon entropy H = -sum p*ln(p) (nats) per CATEGORICAL column
    — the profiler's distribution-shape signal next to n_distinct
    (uniform 8-way enum: ln 8 ~ 2.079; constant column: 0.0).

    NULLs are excluded from the probability mass (n counts non-null
    rows); the per-value groupBy is bounded by the column's
    cardinality, and the fold runs in ascending value order so the
    double is bit-replayable (the PSI/bm25 fold pattern). Returns
    (column, n, n_distinct, entropy); an all-null column yields
    n = 0, entropy NULL."""
    legs = []
    for c in cols:
        counts = (
            df.filter(F.col(c).isNotNull())
            .select(F.col(c).cast("string").alias("_v"))
            .groupBy("_v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
        )
        legs.append(
            counts.groupBy()
            .agg(
                F.expr("CAST(coalesce(sum(_c), 0) AS BIGINT)").alias("n"),
                F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
                F.expr(
                    "sort_array(collect_list(named_struct('v', _v, 'c', _c)))"
                ).alias("_l"),
            )
            .select(
                F.lit(c).alias("column"),
                "n",
                "n_distinct",
                F.expr(
                    "CASE WHEN n > 0 THEN aggregate(_l, 0.0D, "
                    "(acc, x) -> acc - (CAST(x.c AS DOUBLE) "
                    "/ CAST(n AS DOUBLE)) "
                    "* ln(CAST(x.c AS DOUBLE) / CAST(n AS DOUBLE))) END"
                ).alias("entropy"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def categorical_entropy_oracle_sql(table: str, cols: Sequence[str]) -> str:
    """DuckDB replay of :func:`categorical_entropy` — identical
    ascending-value left fold from 0.0."""
    legs = []
    for c in cols:
        legs.append(f"""
SELECT '{c}' AS "column", n, n_distinct,
       CASE WHEN n > 0 THEN
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(_l, x ->
             -(CAST(x.c AS DOUBLE) / CAST(n AS DOUBLE))
             * ln(CAST(x.c AS DOUBLE) / CAST(n AS DOUBLE)))),
           (x, y) -> x + y)
       END AS entropy
FROM (
  SELECT CAST(COALESCE(sum(_c), 0) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_distinct,
         list(struct_pack(v := _v, c := _c) ORDER BY _v) AS _l
  FROM (
    SELECT CAST({c} AS VARCHAR) AS _v, CAST(count(*) AS BIGINT) AS _c
    FROM {table} WHERE {c} IS NOT NULL GROUP BY 1
  )
)""")
    return "\nUNION ALL\n".join(legs)


# ---------------------------------------------------------------------------
# Per-group ordinary least squares (exact integer accumulation)
# ---------------------------------------------------------------------------


def grouped_linregress(
    df: DataFrame, group_cols: Sequence[str], x: str, y: str
) -> DataFrame:
    """Exact per-group simple OLS — slope/intercept/R² of ``y ~ x``
    within every group (the segment-trend fact: "is price still
    rising per unit quantity in THIS region?").

    ONE map-side-combinable groupBy accumulates the five exact sums
    (micros in DECIMAL(38,0) — the `numeric_correlations` contract),
    then a pure per-group finisher::

        slope     = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)   (micro scale cancels)
        intercept = (Sy - slope*Sx) / n / 1e6           (back to y units)
        r2        = (n*Sxy - Sx*Sy)^2
                    / ((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    in fixed IEEE order over the exact integers — bit-replayable by
    the HUGEINT oracle. Rows with a NULL in either column are
    excluded per group. Zero-x-variance groups yield NULL slope /
    intercept / r2 (and constant-y groups NULL r2); NULL group keys
    are ordinary groups. Returns group_cols + (n, slope, intercept,
    r2)."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    both = f"({x} IS NOT NULL AND {y} IS NOT NULL)"
    xm = f"CASE WHEN {both} THEN CAST({_mic(x)} AS DECIMAL(38,0)) END"
    ym = f"CASE WHEN {both} THEN CAST({_mic(y)} AS DECIMAL(38,0)) END"
    agg = df.groupBy(*group_cols).agg(
        F.expr(f"CAST(count_if({both}) AS BIGINT)").alias("n"),
        F.expr(f"CAST(coalesce(sum({xm}), 0) AS DECIMAL(38,0))").alias("_sx"),
        F.expr(f"CAST(coalesce(sum({ym}), 0) AS DECIMAL(38,0))").alias("_sy"),
        F.expr(
            f"CAST(coalesce(sum(({xm}) * ({ym})), 0) AS DECIMAL(38,0))"
        ).alias("_sxy"),
        F.expr(
            f"CAST(coalesce(sum(({xm}) * ({xm})), 0) AS DECIMAL(38,0))"
        ).alias("_sxx"),
        F.expr(
            f"CAST(coalesce(sum(({ym}) * ({ym})), 0) AS DECIMAL(38,0))"
        ).alias("_syy"),
    )
    num = "CAST(n * _sxy - _sx * _sy AS DOUBLE)"
    vx = "CAST(n * _sxx - _sx * _sx AS DOUBLE)"
    vy = "CAST(n * _syy - _sy * _sy AS DOUBLE)"
    slope = f"CASE WHEN {vx} > 0.0D THEN {num} / {vx} END"
    return agg.select(
        *group_cols,
        "n",
        F.expr(slope).alias("slope"),
        F.expr(
            f"CASE WHEN {vx} > 0.0D THEN "
            f"(CAST(_sy AS DOUBLE) - ({num} / {vx}) * CAST(_sx AS DOUBLE))"
            f" / CAST(n AS DOUBLE) / 1000000.0D END"
        ).alias("intercept"),
        F.expr(
            f"CASE WHEN {vx} > 0.0D AND {vy} > 0.0D THEN "
            f"({num} * {num}) / ({vx} * {vy}) END"
        ).alias("r2"),
    )


def grouped_linregress_oracle_sql(
    table: str, group_cols: Sequence[str], x: str, y: str
) -> str:
    """DuckDB replay of :func:`grouped_linregress` — HUGEINT sums,
    identical finisher order."""
    gs = ", ".join(group_cols)
    both = f"({x} IS NOT NULL AND {y} IS NOT NULL)"
    xm = f"CASE WHEN {both} THEN CAST({_mic(x)} AS HUGEINT) END"
    ym = f"CASE WHEN {both} THEN CAST({_mic(y)} AS HUGEINT) END"
    num = "CAST(n * sxy - sx * sy AS DOUBLE)"
    vx = "CAST(n * sxx - sx * sx AS DOUBLE)"
    vy = "CAST(n * syy - sy * sy AS DOUBLE)"
    return f"""
SELECT {gs}, n,
       CASE WHEN {vx} > 0.0 THEN {num} / {vx} END AS slope,
       CASE WHEN {vx} > 0.0 THEN
         (CAST(sy AS DOUBLE) - ({num} / {vx}) * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) / 1000000.0 END AS intercept,
       CASE WHEN {vx} > 0.0 AND {vy} > 0.0 THEN
         ({num} * {num}) / ({vx} * {vy}) END AS r2
FROM (
  SELECT {gs}, CAST(count(*) FILTER ({both}) AS BIGINT) AS n,
         COALESCE(sum({xm}), 0) AS sx, COALESCE(sum({ym}), 0) AS sy,
         COALESCE(sum(({xm}) * ({ym})), 0) AS sxy,
         COALESCE(sum(({xm}) * ({xm})), 0) AS sxx,
         COALESCE(sum(({ym}) * ({ym})), 0) AS syy
  FROM {table} GROUP BY {gs}
)
"""


# ---------------------------------------------------------------------------
# Robust outlier stats: median / MAD (exact, integer micros)
# ---------------------------------------------------------------------------


def mad_outlier_stats(
    df: DataFrame, cols: Sequence[str], k_num: int = 3, k_den: int = 1
) -> DataFrame:
    """Exact robust-outlier fact per numeric column: nearest-rank
    median, MAD (median absolute deviation), and the count of rows
    with ``|x - median| * k_den > k_num * MAD`` — the
    mean/std-independent outlier rule (a single 1e9 row cannot drag
    the threshold the way it drags a z-score's std).

    EVERYTHING is integer arithmetic on micros: median and MAD are
    nearest-rank picks over cumulative counts — the smallest value
    whose cumulative count reaches ``(n+1)/2`` (the exact middle for
    odd n, the UPPER median for even n; both engines evaluate the
    identical comparison) — and the outlier test multiplies through
    by ``k_den`` so no division ever happens: the DuckDB oracle
    replays bit-for-bit by construction. NULLs are excluded per
    column. Returns (column, n, median_mic, mad_mic, n_outliers) —
    micro-scaled like the profiler.

    Plan: ONE raw scan builds the (column, mic, cnt) compact table
    for ALL columns (persisted — its size is the per-column distinct
    count, the exact-profile caveat: at 100 TB on continuous columns
    use the approx profile's binned quantiles instead); the deviation
    table derives from the SAME cached table and is itself persisted
    (two consumers: the MAD pick and the outlier count — without the
    persist each re-aggregated it, measured 2-3x the runtime). The
    median/MAD nearest-rank picks are exact two-phase bucketed picks
    (round 13): parallel coarse-bucket aggregation, target bucket
    from the collected KB-sized bucket table, then a window over ONLY
    the target bucket's values — never a whole-column single-task
    cumulative window (the guide §2.5 straggler shape on
    high-distinct columns). The per-column (total, median, MAD)
    frames are |cols| rows — METADATA — so they collect to the driver
    and re-enter as literals rather than as broadcast-join subtrees
    Spark would re-execute per consumer. Output is |cols| rows,
    returned as a literal frame with both caches unpersisted (the
    `profile_columns` contract)."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    if not cols:
        raise ValueError("cols must be non-empty")
    if int(k_num) < 0 or int(k_den) < 1:
        raise ValueError(
            "k must be a non-negative rational: k_num >= 0, k_den >= 1"
        )
    spark = df.sparkSession
    structs = ", ".join(
        f"named_struct('column', '{c}', 'mic', {_mic(c)})" for c in cols
    )
    compact = (
        df.select(F.expr(f"explode(array({structs}))").alias("_s"))
        .select("_s.column", "_s.mic")
        .filter(F.col("mic").isNotNull())
        .groupBy("column", "mic")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Round 13 (optimization): the rank picks no longer run a
    # per-column window over the WHOLE compact table — with a
    # high-distinct column (583k distinct l_extendedprice values at
    # sf0.1; billions at scale) partitionBy(column) put the entire
    # cumulative sum in ONE task, the exact straggler/OOM shape
    # guide §2.5 warns about (measured 2.9 s of the 4.3 s leg).
    # Replacement: an exact two-phase bucketed pick — coarse ordered
    # buckets (monotone integer shift, ≤4096 per column) aggregate in
    # parallel, the target bucket and its preceding cumulative count
    # come from the collected KB-sized bucket table, and a final
    # parallel job scans only the target bucket's values. The pick is
    # the identical nearest-rank comparison (cum_before + within-bucket
    # cum >= (n+1)/2), so results are bit-equal to the window form.
    stats_rows = (
        compact.groupBy("column")
        .agg(
            F.sum("cnt").cast("bigint").alias("n"),
            F.min("mic").alias("lo"),
            F.max("mic").alias("hi"),
        )
        .collect()
    )
    totals = {r["column"]: int(r["n"]) for r in stats_rows}
    ranges = {
        r["column"]: (int(r["lo"]), int(r["hi"])) for r in stats_rows
    }
    if not totals:
        # EVERY requested column is entirely NULL: the CASE builders
        # below would emit the invalid expression 'CASE  END', so
        # short-circuit to the documented n=0 literal frame.
        compact.unpersist()
        return spark.createDataFrame(
            [(c, 0, None, None, 0) for c in cols],
            "column string, n bigint, median_mic bigint, "
            "mad_mic bigint, n_outliers bigint",
        )

    def _shift_for(lo: int, hi: int, buckets: int = 4096) -> int:
        span = hi - lo + 1
        s = 0
        while (span >> s) > buckets:
            s += 1
        return s

    def _rank_pick(frame, val_col, bases):
        """Per column: min val whose cumulative cnt >= (n+1)/2 —
        exact two-phase bucketed pick; ``bases`` = {col: (lo, hi)}
        bounds of ``val_col``. Two small parallel jobs; only the
        KB-sized bucket table and |cols| rows reach the driver."""
        shift = {c: _shift_for(lo, hi) for c, (lo, hi) in bases.items()}
        lo_case = "CASE " + " ".join(
            f"WHEN column = '{c}' THEN CAST({lo} AS BIGINT)"
            for c, (lo, _) in bases.items()
        ) + " END"
        sh_case = "CASE " + " ".join(
            f"WHEN column = '{c}' THEN {s}" for c, s in shift.items()
        ) + " END"
        b_expr = F.expr(
            f"shiftright(CAST({val_col} AS BIGINT) - ({lo_case}),"
            f" ({sh_case}))"
        )
        btot = (
            frame.filter(F.col("column").isin(list(bases)))
            .groupBy("column", b_expr.alias("_b"))
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
            .collect()
        )
        per_col: dict = {}
        for r in btot:
            per_col.setdefault(r["column"], []).append(
                (int(r["_b"]), int(r["cnt"]))
            )
        target: dict = {}
        for c, bl in per_col.items():
            bl.sort()
            need = (totals[c] + 1) / 2
            cum = 0
            for b, cnt in bl:
                if cum + cnt >= need:
                    target[c] = (b, cum)
                    break
                cum += cnt
        tb_case = "CASE " + " ".join(
            f"WHEN column = '{c}' THEN CAST({b} AS BIGINT)"
            for c, (b, _) in target.items()
        ) + " END"
        cumb_case = "CASE " + " ".join(
            f"WHEN column = '{c}' THEN CAST({cb} AS BIGINT)"
            for c, (_, cb) in target.items()
        ) + " END"
        n_case = "CASE " + " ".join(
            f"WHEN column = '{c}' THEN {totals[c]}" for c in target
        ) + " END"
        w = (
            Window.partitionBy("column")
            .orderBy(val_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return {
            r["column"]: int(r["m"])
            for r in frame.filter(F.col("column").isin(list(target)))
            .filter(b_expr == F.expr(tb_case))
            .withColumn("_cum", F.sum("cnt").over(w) + F.expr(cumb_case))
            .filter(F.col("_cum") >= (F.expr(n_case) + 1) / 2)
            .groupBy("column")
            .agg(F.min(val_col).alias("m"))
            .collect()
        }

    med = _rank_pick(compact, "mic", ranges)
    med_case = "CASE " + " ".join(
        f"WHEN column = '{c}' THEN {m}" for c, m in med.items()
    ) + " END"
    dev = (
        compact.filter(F.col("column").isin(list(med)))
        .select(
            "column",
            F.abs(F.col("mic") - F.expr(med_case)).alias("dev"),
            "cnt",
        )
        .groupBy("column", "dev")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dev_ranges = {
        c: (0, max(hi - med[c], med[c] - lo))
        for c, (lo, hi) in ranges.items()
        if c in med
    }
    mad = _rank_pick(dev, "dev", dev_ranges)
    mad_case = "CASE " + " ".join(
        f"WHEN column = '{c}' THEN {m}" for c, m in mad.items()
    ) + " END"
    out = {
        r["column"]: int(r["o"])
        for r in dev.filter(F.col("column").isin(list(mad)))
        .filter(
            F.col("dev") * F.lit(int(k_den))
            > F.lit(int(k_num)) * F.expr(mad_case)
        )
        .groupBy("column")
        .agg(F.sum("cnt").cast("bigint").alias("o"))
        .collect()
    }
    compact.unpersist()
    dev.unpersist()
    lit_rows = [
        (c, totals.get(c, 0), med.get(c), mad.get(c), out.get(c, 0))
        for c in cols
    ]  # all-null columns profile as n=0
    return spark.createDataFrame(
        lit_rows,
        "column string, n bigint, median_mic bigint, mad_mic bigint, "
        "n_outliers bigint",
    )


def mad_outlier_oracle_sql(
    table: str, cols: Sequence[str], k_num: int = 3, k_den: int = 1
) -> str:
    """DuckDB replay of :func:`mad_outlier_stats` — same compact
    tables, same nearest-rank picks, same multiplied-through integer
    outlier test. Every stage is AS MATERIALIZED: DuckDB inlines
    plain CTEs per reference, and the compact table feeds four
    consumers (the ivfpq sf1 lesson — inlining made that replay
    quadratic)."""
    legs = []
    for c in cols:
        mic = _mic(c)
        legs.append(f"""
SELECT '{c}' AS "column",
       (SELECT COALESCE(CAST(sum(cnt) AS BIGINT), 0) FROM compact_{c}) AS n,
       (SELECT m FROM med_{c}) AS median_mic,
       (SELECT m FROM mad_{c}) AS mad_mic,
       COALESCE((
         SELECT CAST(sum(cnt) AS BIGINT) FROM dev_{c}
         WHERE dev * {int(k_den)} > {int(k_num)} * (SELECT m FROM mad_{c})
       ), 0) AS n_outliers
""")
    ctes = []
    for c in cols:
        mic = _mic(c)
        ctes.append(f"""compact_{c} AS MATERIALIZED (
  SELECT {mic} AS mic, CAST(count(*) AS BIGINT) AS cnt
  FROM {table} WHERE {c} IS NOT NULL GROUP BY 1
),
med_{c} AS MATERIALIZED (
  SELECT min(mic) AS m FROM (
    SELECT mic, sum(cnt) OVER (ORDER BY mic) AS cum,
           sum(cnt) OVER () AS n
    FROM compact_{c}
  ) WHERE cum >= (n + 1) / 2
),
dev_{c} AS MATERIALIZED (
  SELECT abs(mic - (SELECT m FROM med_{c})) AS dev,
         CAST(sum(cnt) AS BIGINT) AS cnt
  FROM compact_{c} GROUP BY 1
),
mad_{c} AS MATERIALIZED (
  SELECT min(dev) AS m FROM (
    SELECT dev, sum(cnt) OVER (ORDER BY dev) AS cum,
           sum(cnt) OVER () AS n
    FROM dev_{c}
  ) WHERE cum >= (n + 1) / 2
)""")
    return "WITH " + ",\n".join(ctes) + "\nUNION ALL\n".join(legs)


# ---------------------------------------------------------------------------
# Benford first-digit conformance
# ---------------------------------------------------------------------------

#: log10(1 + 1/d) computed ONCE here and inlined as repr literals in
#: both engines — the expected Benford mass per leading digit. Driver
#: constants, so JVM-vs-libm log differences cannot touch them.
_BENFORD_P = {d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)}


def benford_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-data / unit-mixing screen for positive
    magnitude-spanning columns (amounts, populations, file sizes).

    The digit is extracted EXACTLY: leading character of the absolute
    micro integer (string form — no float log10 on data), zeros and
    NULLs excluded. chi2 over all 9 digits is computed without
    materializing zero-count digits (the `categorical_association`
    closed form): per OBSERVED digit the term is
    ``(O - E)^2 / E - E`` with ``E = n * p_d`` (``p_d`` a driver
    literal, identical bytes in both engines), folded in ascending
    digit order, + n. Returns one row per (column, digit 1..9 with
    observed rows) as (column, digit, n_obs, n, chi2) — chi2 is the
    COLUMN-level statistic repeated on each of its rows (gate-friendly
    long format; dof is always 8). Rule of thumb: chi2 > 20 at
    million-row scale warrants a look.

    Plan: one explode scan -> one (column, digit) groupBy (<= 9|cols|
    groups) -> per-column 9-element fold. Combinable, metadata-sized
    output."""
    if not cols:
        raise ValueError("cols must be non-empty")
    structs = ", ".join(
        f"named_struct('column', '{c}', 'mic', {_mic(c)})" for c in cols
    )
    digits = (
        df.select(F.expr(f"explode(array({structs}))").alias("_s"))
        .select("_s.column", "_s.mic")
        .filter(F.col("mic").isNotNull() & (F.col("mic") != 0))
        .select(
            "column",
            F.expr(
                "CAST(substring(CAST(abs(mic) AS STRING), 1, 1) AS BIGINT)"
            ).alias("digit"),
        )
        .groupBy("column", "digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )
    p_case = "CASE " + " ".join(
        f"WHEN x.d = {d} THEN {p!r}D" for d, p in _BENFORD_P.items()
    ) + " END"
    per_col = digits.groupBy("column").agg(
        F.expr("CAST(sum(n_obs) AS BIGINT)").alias("n"),
        F.expr(
            "sort_array(collect_list(named_struct('d', digit, 'o', n_obs)))"
        ).alias("_l"),
    ).select(
        "column",
        "n",
        # the per-element term is fully parenthesized so the fold is
        # acc + (term) — the oracle's list_transform-then-reduce order;
        # (acc + q) - e vs acc + (q - e) differ in the last ulp
        F.expr(
            f"aggregate(_l, 0.0D, (acc, x) -> acc"
            f" + ((CAST(x.o AS DOUBLE) - CAST(n AS DOUBLE) * ({p_case}))"
            f" * (CAST(x.o AS DOUBLE) - CAST(n AS DOUBLE) * ({p_case}))"
            f" / (CAST(n AS DOUBLE) * ({p_case}))"
            f" - CAST(n AS DOUBLE) * ({p_case})))"
            " + CAST(n AS DOUBLE)"
        ).alias("chi2"),
    )
    return digits.join(per_col, "column").select(
        "column", "digit", "n_obs", "n", "chi2"
    )


def benford_oracle_sql(table: str, cols: Sequence[str]) -> str:
    """DuckDB replay of :func:`benford_stats` — identical digit
    extraction, literal p_d bytes, ascending-digit fold + n. Digit
    counts are AS MATERIALIZED (three consumers per column)."""
    p_case = "CASE " + " ".join(
        f"WHEN x.d = {d} THEN {p!r}" for d, p in _BENFORD_P.items()
    ) + " END"
    ctes = []
    legs = []
    for c in cols:
        mic = _mic(c)
        ctes.append(f"""bd_{c} AS MATERIALIZED (
  SELECT CAST(substring(CAST(abs(mic) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM (SELECT {mic} AS mic FROM {table})
  WHERE mic IS NOT NULL AND mic != 0 GROUP BY 1
),
bs_{c} AS MATERIALIZED (
  SELECT t.n,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(l.lst,
             x -> (CAST(x.o AS DOUBLE) - CAST(t.n AS DOUBLE) * ({p_case}))
                  * (CAST(x.o AS DOUBLE) - CAST(t.n AS DOUBLE) * ({p_case}))
                  / (CAST(t.n AS DOUBLE) * ({p_case}))
                  - CAST(t.n AS DOUBLE) * ({p_case}))),
           (x, y) -> x + y) + CAST(t.n AS DOUBLE) AS chi2
  FROM (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM bd_{c}) t
  CROSS JOIN (SELECT list(struct_pack(d := digit, o := n_obs)
                          ORDER BY digit) AS lst FROM bd_{c}) l
)""")
        legs.append(f"""
SELECT '{c}' AS "column", d.digit, d.n_obs, p.n, p.chi2
FROM bd_{c} d CROSS JOIN bs_{c} p
""")
    return "WITH " + ",\n".join(ctes) + "\nUNION ALL\n".join(legs)


def grouped_correlations(
    df: DataFrame, group_cols: Sequence[str], cols: Sequence[str]
) -> DataFrame:
    """`numeric_correlations` within every group — "is the
    price/quantity relationship different for returned lineitems?".
    Same exact DECIMAL accumulation and fixed-order IEEE finisher,
    one map-side-combinable groupBy for ALL pairs and groups; NULL
    group keys are ordinary groups. Returns group_cols +
    (col_x, col_y, n_pairs, corr)."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if len(cols) < 2:
        raise ValueError("grouped_correlations needs >= 2 columns")
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    aggs = []
    for t, (x, y) in enumerate(pairs):
        aggs.extend(_corr_pair_aggs(x, y, f"p{t}"))
    projected = df.select(
        *group_cols, *[F.expr(_mic(c)).alias(f"_m_{c}") for c in cols]
    )
    wide = projected.groupBy(*group_cols).agg(*aggs)
    rows = []
    for t, (x, y) in enumerate(pairs):
        g = f"p{t}"
        num = f"CAST(n_{g} * sxy_{g} - sx_{g} * sy_{g} AS DOUBLE)"
        vx = f"CAST(n_{g} * sxx_{g} - sx_{g} * sx_{g} AS DOUBLE)"
        vy = f"CAST(n_{g} * syy_{g} - sy_{g} * sy_{g} AS DOUBLE)"
        rows.append(
            f"named_struct("
            f"'col_x', '{x}', 'col_y', '{y}', 'n_pairs', n_{g}, "
            f"'corr', CASE WHEN {vx} > 0.0D AND {vy} > 0.0D "
            f"THEN {num} / (sqrt({vx}) * sqrt({vy})) END)"
        )
    return wide.select(
        *group_cols,
        F.explode(F.expr("array(" + ", ".join(rows) + ")")).alias("_r"),
    ).select(
        *group_cols, "_r.col_x", "_r.col_y", "_r.n_pairs", "_r.corr"
    )


def grouped_correlations_oracle_sql(
    table: str, group_cols: Sequence[str], cols: Sequence[str]
) -> str:
    """DuckDB replay of :func:`grouped_correlations`."""
    gs = ", ".join(group_cols)
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    legs = []
    for x, y in pairs:
        both = f"({x} IS NOT NULL AND {y} IS NOT NULL)"
        xm = f"CASE WHEN {both} THEN CAST({_mic(x)} AS HUGEINT) END"
        ym = f"CASE WHEN {both} THEN CAST({_mic(y)} AS HUGEINT) END"
        legs.append(f"""
SELECT {gs}, '{x}' AS col_x, '{y}' AS col_y, n AS n_pairs,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0.0
              AND CAST(n * syy - sy * sy AS DOUBLE) > 0.0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS corr
FROM (
  SELECT {gs}, CAST(count(*) FILTER ({both}) AS BIGINT) AS n,
         COALESCE(sum({xm}), 0) AS sx, COALESCE(sum({ym}), 0) AS sy,
         COALESCE(sum(({xm}) * ({ym})), 0) AS sxy,
         COALESCE(sum(({xm}) * ({xm})), 0) AS sxx,
         COALESCE(sum(({ym}) * ({ym})), 0) AS syy
  FROM {table} GROUP BY {gs}
)""")
    return "\nUNION ALL\n".join(legs)


# ---------------------------------------------------------------------------
# Null-pattern analysis (co-missingness)
# ---------------------------------------------------------------------------


def null_pattern_stats(
    df: DataFrame, cols: Sequence[str], top: int = 20
) -> DataFrame:
    """Missing-data PATTERN analysis: which null-mask combinations
    actually occur, and how often — the co-missingness fact behind
    "these three columns are always null together" (one broken
    upstream join) vs "nulls are independent" (organic sparsity).
    Per-column null COUNTS can't distinguish those; patterns can.

    Each row maps to the string mask over ``cols`` ('1' = null at
    that position); one combinable groupBy over the mask (cardinality
    <= 2^|cols| but in practice a handful), TakeOrdered top-``top``
    cut by (count DESC, pattern ASC) — a total order. Returns
    (pattern, n_rows, n_nulls) with n_nulls = nulls in the pattern.
    Pure integers: engines cannot diverge."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if len(cols) > 30:
        raise ValueError("null_pattern_stats caps at 30 columns")
    mask = "concat(" + ", ".join(
        f"CASE WHEN {c} IS NULL THEN '1' ELSE '0' END" for c in cols
    ) + ")"
    return (
        df.select(F.expr(mask).alias("pattern"))
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .withColumn(
            "n_nulls",
            (F.length("pattern") - F.length(F.replace(F.col("pattern"), F.lit("1"), F.lit("")))).cast("bigint"),
        )
        .orderBy(F.col("n_rows").desc(), F.col("pattern"))
        .limit(int(top))
    )


def null_pattern_oracle_sql(
    table: str, cols: Sequence[str], top: int = 20
) -> str:
    mask = " || ".join(
        f"CASE WHEN {c} IS NULL THEN '1' ELSE '0' END" for c in cols
    )
    return f"""
SELECT pattern, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(len(pattern) - len(replace(pattern, '1', '')) AS BIGINT)
         AS n_nulls
FROM (SELECT ({mask}) AS pattern FROM {table})
GROUP BY 1
ORDER BY n_rows DESC, pattern
LIMIT {int(top)}
"""


def mad_from_approx_shards(
    shards: Sequence["DataFrame"],
    cols: Sequence[str],
    k_num: int = 3,
    k_den: int = 1,
):
    """APPROX median/MAD/outlier estimates from the mergeable
    fixed-bin artifacts (``profile_shard_approx(bins=B, ranges=…)``)
    — the 100 TB companion `mad_outlier_stats`' docstring points to:
    the exact op's compact table is distinct-count-sized, this reads
    only KB-sized artifacts that each shard already produced for
    profiling.

    Conventions shared with ``profile_from_approx_shards``: shard
    histograms merge by exact element-wise addition (identical
    (lo, span) validated), a bin's representative value is its lowest
    micro ``lo + ceil(b*span/B)``, and picks are the smallest
    value whose cumulative count reaches (n+1)/2 (the exact op's
    rule). Error bound vs `mad_outlier_stats` when the declared range
    covers the data: the median estimate is within one bin width w =
    ceil(span/B); each value's deviation is within 2w of its true
    deviation; so mad_mic_est is within 3w and the outlier count is
    exact outside the ±3w band around the threshold. Out-of-range
    values clamp into edge bins and degrade the bound by the clamp
    distance.

    Returns a literal frame (column, n_binned, median_mic_est,
    mad_mic_est, n_outliers_est, bin_width_mic). All-empty columns
    yield NULL estimates. Driver work is B-bin metadata per column."""
    import math

    if not shards:
        raise ValueError("mad_from_approx_shards needs >= 1 shard")
    if not cols:
        raise ValueError("cols must be non-empty")
    if int(k_num) < 0 or int(k_den) < 1:
        raise ValueError(
            "k must be a non-negative rational: k_num >= 0, k_den >= 1"
        )
    merged = shards[0]
    for s in shards[1:]:
        merged = merged.unionByName(s)
    if "hist" not in merged.columns:
        raise ValueError("artifacts carry no histogram — build with bins > 0")
    spark = merged.sparkSession
    agg = (
        merged.filter(F.col("column").isin(list(cols)))
        .groupBy("column")
        .agg(
            F.min("h_lo").alias("h_lo"),
            F.max("h_lo").alias("h_lo2"),
            F.min("h_span").alias("h_span"),
            F.max("h_span").alias("h_span2"),
            F.min(F.size("hist")).alias("h_bins"),
            F.max(F.size("hist")).alias("h_bins2"),
            F.expr(
                "aggregate(collect_list(hist), "
                "transform(try_element_at(collect_list(hist), 1), "
                "x -> CAST(0 AS BIGINT)), "
                "(acc, x) -> zip_with(acc, x, (a, b) -> a + b))"
            ).alias("hist"),
        )
    )
    out = {}
    for r in agg.collect():
        c = r["column"]
        if r["hist"] is None:
            raise ValueError(
                f"artifacts for column {c!r} carry no histogram — "
                "build with bins > 0"
            )
        if r["h_lo"] != r["h_lo2"] or r["h_span"] != r["h_span2"]:
            raise ValueError(
                f"shards disagree on (lo, span) for column {c!r}"
            )
        if r["h_bins"] != r["h_bins2"]:
            # Without this, zip_with null-pads the shorter histogram
            # and the int(x) below dies with an opaque TypeError.
            raise ValueError(
                f"shards disagree on bins for column {c!r} "
                f"({r['h_bins']} vs {r['h_bins2']})"
            )
        lo, span = int(r["h_lo"]), int(r["h_span"])
        hist = [int(x) for x in r["hist"]]
        B = len(hist)
        n = sum(hist)
        w = -(-span // B)  # ceil(span/B): the bin width bound
        if n == 0:
            out[c] = (c, 0, None, None, None, w)
            continue

        def v(b):
            return lo + math.ceil(b * span / B)

        def pick(pairs):
            # smallest value whose cumulative count >= (n+1)/2 —
            # pairs pre-sorted ascending by value
            cum, need = 0, (n + 1) / 2
            for val, cnt in pairs:
                cum += cnt
                if cum >= need:
                    return val
            return pairs[-1][0]

        med = pick([(v(b), hist[b]) for b in range(B)])
        devs = sorted(
            (abs(v(b) - med), hist[b]) for b in range(B)
        )
        mad = pick(devs)
        outl = sum(
            cnt for dev, cnt in devs if dev * int(k_den) > int(k_num) * mad
        )
        out[c] = (c, n, med, mad, outl, w)
    rows = [out.get(c, (c, 0, None, None, None, 0)) for c in cols]
    return spark.createDataFrame(
        rows,
        "column string, n_binned bigint, median_mic_est bigint, "
        "mad_mic_est bigint, n_outliers_est bigint, bin_width_mic bigint",
    )
