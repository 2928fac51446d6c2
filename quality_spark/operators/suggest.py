"""Rule suggestion — close the profile → DQ-rule authoring loop.

``operators/profile.py`` exists so DQ rules can be WRITTEN; this module
writes them: given a profile (the long (column, stat, value) frame),
emit a ``RuleSuite`` of observed-invariant rules the profiled data is
guaranteed to pass —

- ``not_null``: ``c IS NOT NULL`` — only when the profile observed
  ZERO nulls (or a caller-raised tolerance was met),
- ``range``: ``c IS NULL OR (c >= min AND c <= max)`` — inclusive of
  the observed extremes, null-guarded so the range rule never
  double-reports a nullability problem,
- ``soft_range``: ``soft_fail(c IS NULL OR (c BETWEEN p_lo AND
  p_hi))`` — when the profile carries nearest-rank quantiles; values
  outside the central band soft-fail (reported, never failing the
  suite).

DETERMINISM CONTRACT (what makes this gateable): thresholds come from
the profile's integer micros, rendered by ONE fixed text spec —
sign, integer part, '.', exactly six fractional digits — that a SQL
oracle reproduces with string functions from the same stat values. So
the suggested rule TEXTS are a pure function of the profile, identical
across engines, and the driver gate compares them verbatim.

By construction the profiled data passes its own suggested suite
(inclusive bounds; quantile bands are soft) — pinned by a test that
runs the suite through the real rule runner.

Reference loop: the reference engine assumes profiled inputs and stops
at rule execution (SURVEY §2.9 note); this closes the authoring half.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame

from ..model import Id, Rule, RuleSet, RuleSuite

#: rule-kind order — also the rule-id offset within a column's block
RULE_KINDS = ("not_null", "range", "soft_range")

#: rule ids are base + column_index * stride + kind_index (stable
#: across runs for a fixed column list)
_ID_STRIDE = 10


def micro_to_decimal(v: int) -> str:
    """The fixed text spec for a micro-scaled threshold: sign,
    integer part, '.', exactly six fractional digits (no stripping —
    ``0.080000``, not ``0.08`` — so the SQL oracle can reproduce it
    with lpad)."""
    a = abs(int(v))
    sign = "-" if int(v) < 0 else ""
    return f"{sign}{a // 1_000_000}.{a % 1_000_000:06d}"


def _stat_map(profile_rows) -> Dict[str, Dict[str, int]]:
    out: Dict[str, Dict[str, int]] = {}
    for r in profile_rows:
        out.setdefault(r["column"], {})[r["stat"]] = r["value"]
    return out


def suggested_rule_texts(
    profile: DataFrame,
    cols: Sequence[str],
    quantile_band: Tuple[str, str] = ("p25", "p95"),
    null_tolerance: float = 0.0,
) -> List[Tuple[str, str, str]]:
    """(column, rule_kind, expression_text) for every rule the profile
    supports — the deterministic core ``suggest_rules`` wraps into a
    ``RuleSuite``. ``profile`` is the long frame from
    ``profile_columns`` / ``profile_from_shards`` (collected here —
    it is metadata-sized by construction)."""
    stats = _stat_map(profile.collect())
    lo_q, hi_q = quantile_band
    out: List[Tuple[str, str, str]] = []
    for c in cols:
        s = stats.get(c, {})
        n, n_null = s.get("n"), s.get("n_null")
        if (
            n is not None
            and n_null is not None
            and (n + n_null) > 0
            and n_null <= float(null_tolerance) * (n + n_null)
        ):
            out.append((c, "not_null", f"{c} IS NOT NULL"))
        mn, mx = s.get("min"), s.get("max")
        if mn is not None and mx is not None:
            out.append(
                (
                    c,
                    "range",
                    f"{c} IS NULL OR ({c} >= {micro_to_decimal(mn)}"
                    f" AND {c} <= {micro_to_decimal(mx)})",
                )
            )
        plo, phi = s.get(lo_q), s.get(hi_q)
        if plo is not None and phi is not None:
            out.append(
                (
                    c,
                    "soft_range",
                    f"soft_fail({c} IS NULL OR ({c} BETWEEN "
                    f"{micro_to_decimal(plo)} AND {micro_to_decimal(phi)}))",
                )
            )
    return out


def suggest_rules(
    profile: DataFrame,
    cols: Sequence[str],
    suite_id: Id = Id(9000, 1),
    set_id: Id = Id(9001, 1),
    base_rule_id: int = 90000,
    quantile_band: Tuple[str, str] = ("p25", "p95"),
    null_tolerance: float = 0.0,
    categorical_profile: DataFrame = None,
    categorical_cols: Sequence[str] = (),
    max_card: int = 8,
    categorical_types: Dict[str, str] = None,
) -> RuleSuite:
    """Wrap ``suggested_rule_texts`` into a runnable ``RuleSuite``
    (one rule set; rule ids ``base + col_index·10 + kind_index``,
    version 1 — stable for a fixed column list, so re-profiling the
    same columns yields id-compatible suites for the versioned
    loaders). Pass a ``profile_categorical`` frame (and the column
    list that orders its ids) to fold IN-set enum rules into the same
    suite — kind index 3, after the numeric kinds."""
    texts = [
        (c, RULE_KINDS.index(kind), expr)
        for c, kind, expr in suggested_rule_texts(
            profile, cols, quantile_band, null_tolerance
        )
    ]
    col_index = {c: i for i, c in enumerate(cols)}
    if categorical_profile is not None:
        cat_cols = list(categorical_cols) or list(cols)
        for j, c in enumerate(cat_cols):
            col_index.setdefault(c, len(cols) + j)
        texts += [
            (c, len(RULE_KINDS), expr)
            for c, _, expr in suggested_in_set_rule_texts(
                categorical_profile, max_card, categorical_types
            )
            if c in col_index
        ]
    rules = tuple(
        Rule(
            Id(base_rule_id + col_index[c] * _ID_STRIDE + kind_idx, 1),
            expr,
        )
        for c, kind_idx, expr in texts
    )
    return RuleSuite(suite_id, (RuleSet(set_id, rules),))


def suggested_in_set_rule_texts(
    cat_profile: DataFrame,
    max_card: int = 8,
    col_types: Dict[str, str] = None,
) -> List[Tuple[str, str, str]]:
    """(column, 'in_set', expression_text) from a categorical profile
    (``profile_categorical``): an enum rule ``c IN ('a','b',…)`` —
    null-guarded when nulls were observed — for every column whose
    full distinct count is ≤ ``max_card`` AND whose profile actually
    carries all of them (``top`` ≥ cardinality; otherwise the rule
    would be authored from a truncated value set and silently fail
    live data). Values render sorted ascending with '' doubling for
    quotes — a fixed text spec the SQL oracle reproduces with
    string_agg.

    The profile's values are strings (``profile_categorical`` casts),
    so the emitted comparison is a STRING comparison. For a
    string-typed source column that is exact; for other types pass
    ``col_types`` (column → Spark simpleString, e.g. from
    ``dict((f.name, f.dataType.simpleString()) for f in df.schema)``)
    and non-string columns are wrapped ``CAST(c AS STRING) IN (…)``
    so the rule compares in the same domain it was profiled in,
    instead of leaning on engine-specific implicit casts."""
    rows = cat_profile.collect()
    by_col: Dict[str, list] = {}
    for r in rows:
        by_col.setdefault(r["column"], []).append(r)
    out: List[Tuple[str, str, str]] = []
    for c in sorted(by_col):
        rs = by_col[c]
        card = int(rs[0]["n_distinct"])
        non_null = sorted(
            r["value"] for r in rs if r["value"] is not None
        )
        has_null = any(r["value"] is None for r in rs)
        if card > int(max_card) or len(non_null) < card or card == 0:
            continue
        vals = ", ".join("'" + v.replace("'", "''") + "'" for v in non_null)
        ref = c
        if col_types is not None and col_types.get(c, "string") != "string":
            ref = f"CAST({c} AS STRING)"
        expr = f"{ref} IN ({vals})"
        if has_null:
            expr = f"{c} IS NULL OR {expr}"
        out.append((c, "in_set", expr))
    return out


def suggested_in_set_rule_texts_oracle_sql(
    cat_profile_sql: str,
    max_card: int = 8,
) -> str:
    """DuckDB replay: same cardinality/coverage gates, same sorted
    quoted rendering via string_agg(... ORDER BY value)."""
    return f"""
WITH cp AS ({cat_profile_sql}),
agg AS (
  SELECT "column" AS col,
    MAX(n_distinct) AS card,
    COUNT(CASE WHEN value IS NOT NULL THEN 1 END) AS n_vals,
    BOOL_OR(value IS NULL) AS has_null,
    string_agg(CASE WHEN value IS NOT NULL
                    THEN '''' || replace(value, '''', '''''') || ''''
               END, ', ' ORDER BY value) AS vals
  FROM cp GROUP BY 1
)
SELECT col AS "column", 'in_set' AS rule_kind,
  CASE WHEN has_null THEN col || ' IS NULL OR ' ELSE '' END
    || col || ' IN (' || vals || ')' AS expr
FROM agg
WHERE card <= {int(max_card)} AND n_vals >= card AND card > 0
"""


def suggested_rule_texts_oracle_sql(
    profile_sql: str,
    quantile_band: Tuple[str, str] = ("p25", "p95"),
) -> str:
    """DuckDB replay: assemble the identical rule texts from the same
    profile stats with string functions — pivots the long profile,
    renders micros with the same sign/6-digit spec, emits
    (column, rule_kind, expr). ``null_tolerance`` 0 only (the gate's
    setting: not_null iff no nulls observed)."""
    lo_q, hi_q = quantile_band

    def fmt(col: str) -> str:
        return (
            f"(CASE WHEN {col} < 0 THEN '-' ELSE '' END"
            f" || CAST(abs({col}) // 1000000 AS VARCHAR)"
            f" || '.' || lpad(CAST(abs({col}) % 1000000 AS VARCHAR), 6, '0'))"
        )

    return f"""
WITH prof AS ({profile_sql}),
piv AS (
  SELECT "column" AS col,
    MAX(CASE WHEN stat = 'n' THEN value END) AS n,
    MAX(CASE WHEN stat = 'n_null' THEN value END) AS n_null,
    MAX(CASE WHEN stat = 'min' THEN value END) AS mn,
    MAX(CASE WHEN stat = 'max' THEN value END) AS mx,
    MAX(CASE WHEN stat = '{lo_q}' THEN value END) AS plo,
    MAX(CASE WHEN stat = '{hi_q}' THEN value END) AS phi
  FROM prof GROUP BY 1
)
SELECT col AS "column", 'not_null' AS rule_kind,
       col || ' IS NOT NULL' AS expr
FROM piv WHERE n_null = 0 AND n + n_null > 0
UNION ALL
SELECT col, 'range',
       col || ' IS NULL OR (' || col || ' >= ' || {fmt("mn")}
           || ' AND ' || col || ' <= ' || {fmt("mx")} || ')'
FROM piv WHERE mn IS NOT NULL AND mx IS NOT NULL
UNION ALL
SELECT col, 'soft_range',
       'soft_fail(' || col || ' IS NULL OR (' || col || ' BETWEEN '
           || {fmt("plo")} || ' AND ' || {fmt("phi")} || '))'
FROM piv WHERE plo IS NOT NULL AND phi IS NOT NULL
"""
