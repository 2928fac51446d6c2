"""Result model: schemas, int encoding, overall-result folds.

Reference semantics being reproduced:
- result ADT stored as one Integer: Passed=100000, Failed=0,
  SoftFailed=-1, DisabledRule=-2, Probability(p)=int(p*100000)
  (reference: impl/imports/RuleRunnerImports.scala:57-60,
  impl/RuleImpl.scala:147-160 ``anyToRuleResultInt``);
- overall result folds Failed-dominant, probabilities below
  ``probablePass`` fail (reference: impl/OverallResult.scala:21-30);
- Spark-visible result schemas (reference: impl/RuleSparkTypes.scala:9-35).
"""

from __future__ import annotations

from functools import reduce
from typing import List, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .model import PASSED_INT

# ---------------------------------------------------------------------------
# Schemas (reference: impl/RuleSparkTypes.scala:9-35)
# ---------------------------------------------------------------------------

rule_result_type = T.IntegerType()
packed_id_type = T.LongType()

rule_set_type = T.StructType(
    [
        T.StructField("overallResult", rule_result_type, False),
        T.StructField("ruleResults", T.MapType(packed_id_type, rule_result_type, False)),
    ]
)

rule_set_results_type = T.MapType(packed_id_type, rule_set_type, False)

rule_suite_result_type = T.StructType(
    [
        T.StructField("id", packed_id_type),
        T.StructField("overallResult", rule_result_type, False),
        T.StructField("ruleSetResults", rule_set_results_type),
    ]
)

rule_suite_details_result_type = T.StructType(
    [
        T.StructField("id", packed_id_type),
        T.StructField("ruleSetResults", rule_set_results_type),
    ]
)

full_rule_id_type = T.StructType(
    [
        T.StructField("ruleSuiteId", packed_id_type),
        T.StructField("ruleSetId", packed_id_type),
        T.StructField("ruleId", packed_id_type),
    ]
)

flatten_struct_type = T.StructType(
    [
        T.StructField("ruleSuiteId", T.IntegerType()),
        T.StructField("ruleSuiteVersion", T.IntegerType()),
        T.StructField("ruleSuiteResult", T.IntegerType()),
        T.StructField("ruleSetResult", T.IntegerType()),
        T.StructField("ruleSetId", T.IntegerType()),
        T.StructField("ruleSetVersion", T.IntegerType()),
        T.StructField("ruleId", T.IntegerType()),
        T.StructField("ruleVersion", T.IntegerType()),
        T.StructField("ruleResult", T.IntegerType()),
    ]
)

expression_result_type_yaml = T.StructType(
    [
        T.StructField("result", T.StringType()),
        T.StructField("resultDDL", T.StringType()),
    ]
)


# ---------------------------------------------------------------------------
# Per-rule int encoding (reference: impl/RuleImpl.scala:147-160)
# ---------------------------------------------------------------------------


def _sat_int(d: str) -> str:
    """Saturating double→int truncation — reproduces JVM ``Double.toInt``
    and stays ANSI-mode safe (Spark 4 defaults ANSI on, where a plain
    overflowing CAST raises)."""
    return (
        f"CAST(GREATEST(LEAST({d}, 2147483647.0D), -2147483648.0D) AS INT)"
    )


def encode_rule_sql(rule_sql: str, dtype: T.DataType) -> str:
    """SQL text converting an evaluated rule expression of known type to
    the integer result encoding. Null → Failed (matches the reference's
    ``case _ => FailedInt`` on a null value)."""
    e = f"({rule_sql})"
    if isinstance(dtype, T.BooleanType):
        return f"(CASE WHEN {e} THEN {PASSED_INT} ELSE 0 END)"
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return (
            f"(CASE CAST({e} AS BIGINT) WHEN 0 THEN 0 WHEN 1 THEN {PASSED_INT} "
            f"WHEN -1 THEN -1 WHEN -2 THEN -2 ELSE 0 END)"
        )
    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        d = f"CAST({e} AS DOUBLE)"
        # isnan BEFORE the saturation: NaN compares false against the
        # sentinel values and NaN-sorts-greatest in LEAST/GREATEST, so
        # without this branch NaN saturates to INT_MAX and silently
        # PASSES — the JVM's (int)NaN is 0, i.e. Failed
        return (
            f"(CASE WHEN {d} IS NULL THEN 0 WHEN isnan({d}) THEN 0 "
            f"WHEN {d} = 0.0D THEN 0 "
            f"WHEN {d} = 1.0D THEN {PASSED_INT} WHEN {d} = -1.0D THEN -1 "
            f"WHEN {d} = -2.0D THEN -2 "
            f"ELSE {_sat_int(f'{d} * {PASSED_INT}')} END)"
        )
    if isinstance(dtype, T.StringType):
        s = f"lower({e})"
        return (
            f"(CASE WHEN {s} IN ('true','passed','pass','yes','1','1.0') THEN {PASSED_INT} "
            f"WHEN {s} IN ('softfail','maybe') THEN -1 "
            f"WHEN {s} IN ('disabledrule','disabled') THEN -2 "
            f"ELSE 0 END)"
        )
    # any other type is a fail (reference: anyToRuleResultInt catch-all)
    return "0"


def encode_rule_sql_duck(rule_sql: str, duck_type: str) -> str:
    """DuckDB twin of :func:`encode_rule_sql`, keyed on DuckDB type
    names (no ``D`` double-literal suffixes, same semantics incl.
    null→Failed and saturating double→int truncation). Powers the
    Spark-free sparkless processor."""
    e = f"({rule_sql})"
    t = duck_type.upper()
    if t == "BOOLEAN":
        return f"(CASE WHEN {e} THEN {PASSED_INT} ELSE 0 END)"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT"):
        return (
            f"(CASE CAST({e} AS BIGINT) WHEN 0 THEN 0 WHEN 1 THEN {PASSED_INT} "
            f"WHEN -1 THEN -1 WHEN -2 THEN -2 ELSE 0 END)"
        )
    if t in ("FLOAT", "DOUBLE", "REAL") or t.startswith("DECIMAL"):
        d = f"CAST({e} AS DOUBLE)"
        # trunc() before the cast: DuckDB ROUNDS on double→int CAST
        # where Spark (and the JVM) truncate — without it a probability
        # like 2/3 encodes 66667 here vs 66666 in the Spark runner and
        # can flip a rule at the probable_pass threshold
        sat = (
            f"CAST(trunc(GREATEST(LEAST({d} * {PASSED_INT}, 2147483647.0), "
            f"-2147483648.0)) AS INT)"
        )
        # isnan guard mirrors the Spark/JVM branch: (int)NaN is 0
        return (
            f"(CASE WHEN {d} IS NULL THEN 0 WHEN isnan({d}) THEN 0 "
            f"WHEN {d} = 0.0 THEN 0 "
            f"WHEN {d} = 1.0 THEN {PASSED_INT} WHEN {d} = -1.0 THEN -1 "
            f"WHEN {d} = -2.0 THEN -2 ELSE {sat} END)"
        )
    if t == "VARCHAR":
        s = f"lower({e})"
        return (
            f"(CASE WHEN {s} IN ('true','passed','pass','yes','1','1.0') THEN {PASSED_INT} "
            f"WHEN {s} IN ('softfail','maybe') THEN -1 "
            f"WHEN {s} IN ('disabledrule','disabled') THEN -2 "
            f"ELSE 0 END)"
        )
    return "0"


def encode_rule_sql_generic(rule_sql: str) -> str:
    """Type-agnostic encoding used when no target DataFrame is available
    to probe expression types: routes through a double cast. Exact for
    boolean/double/decimal rules; integer results outside {0,1,-1,-2}
    differ from the reference (which fails them) — probe-typed encoding
    is used everywhere a DataFrame is in hand."""
    e = f"({rule_sql})"
    d = f"CAST({e} AS DOUBLE)"
    return (
        f"(CASE WHEN {d} IS NULL THEN 0 WHEN isnan({d}) THEN 0 "
        f"WHEN {d} = 0.0D THEN 0 "
        f"WHEN {d} = 1.0D THEN {PASSED_INT} WHEN {d} = -1.0D THEN -1 "
        f"WHEN {d} = -2.0D THEN -2 "
        f"ELSE {_sat_int(f'{d} * {PASSED_INT}')} END)"
    )


# ---------------------------------------------------------------------------
# Overall-result folds (reference: impl/OverallResult.scala:21-30)
# ---------------------------------------------------------------------------


def rule_fails(enc: Column, probable_pass: float) -> Column:
    """True when this encoded result forces the overall result to Failed:
    Failed itself, or a probability below the threshold."""
    threshold = float(probable_pass) * PASSED_INT
    return (enc == 0) | (
        ~enc.isin(PASSED_INT, -1, -2) & (enc.cast("double") < F.lit(threshold))
    )


def overall_result(encs: Sequence[Column], probable_pass: float) -> Column:
    """Fold encoded results into an overall Passed/Failed int."""
    if not encs:
        return F.lit(PASSED_INT)
    # balanced OR tree, not reduce(|): left-deep chains are O(rules)
    # deep and StackOverflow the JVM's recursive column-node conversion
    # near 500 rules; balanced is log2(rules).
    terms = [rule_fails(e, probable_pass) for e in encs]
    while len(terms) > 1:
        terms = [
            (terms[i] | terms[i + 1]) if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return F.when(terms[0], F.lit(0)).otherwise(F.lit(PASSED_INT)).cast("int")


def rule_fails_sql(
    enc_sql: str, probable_pass: float, dialect: str = "spark"
) -> str:
    """SQL-text twin of :func:`rule_fails` — THE single definition of
    the fail condition for both dialects (only the double-literal
    suffix differs)."""
    threshold = float(probable_pass) * PASSED_INT
    lit = f"{threshold}D" if dialect == "spark" else f"{threshold}"
    e = f"({enc_sql})"
    return (
        f"({e} = 0 OR ({e} NOT IN ({PASSED_INT}, -1, -2) "
        f"AND CAST({e} AS DOUBLE) < {lit}))"
    )


def overall_result_spark_sql(enc_sqls: Sequence[str], probable_pass: float) -> str:
    """SQL-text twin of :func:`overall_result`, shaped as a FLAT
    ``array_contains(array(fail1..failN), true)``.

    Shape matters at 1000+ rules: a left-deep OR chain StackOverflows
    the JVM's recursive expression walks near 500 rules, and a BALANCED
    OR tree OOMs the ANTLR parser (nested-paren DFA blowup) — the flat
    n-ary array is the only shape that both parses and analyzes at any
    suite size."""
    if not enc_sqls:
        return f"CAST({PASSED_INT} AS INT)"
    fails = ", ".join(rule_fails_sql(e, probable_pass) for e in enc_sqls)
    return (
        f"CAST(CASE WHEN array_contains(array({fails}), true) THEN 0 "
        f"ELSE {PASSED_INT} END AS INT)"
    )


def overall_result_sql(enc_sqls: Sequence[str], probable_pass: float) -> str:
    """Same fold as :func:`overall_result` but over SQL text — reused to
    generate DuckDB oracle queries in tests. Delegates the fail
    condition to :func:`rule_fails_sql` so the semantics live in one
    place."""
    if not enc_sqls:
        return str(PASSED_INT)
    conds = [rule_fails_sql(e, probable_pass, "duckdb") for e in enc_sqls]
    return f"(CASE WHEN {' OR '.join(conds)} THEN 0 ELSE {PASSED_INT} END)"
