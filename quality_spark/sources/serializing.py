"""Rule-suite metadata ←→ DataFrame round-trips.

Rules are data: any DataFrame with the documented columns loads into
``RuleSuiteMap`` and writes back out losslessly
(reference: impl/util/serializing.scala:225-328 read, :334-408 write,
row shapes impl/util/SerializationModel.scala:14-33).

These are *metadata* loaders — rule tables are tiny relative to data
tables, so a driver-side collect is the right call even at 100 TB data
scale (rule tables are metadata-sized by contract; collect() avoids
toLocalIterator's one-sequential-job-per-partition behavior — 6.8 s for
5 rows across 32 local-relation partitions, measured. Reference:
serializing.scala:308).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import (
    DEFAULT_SALIENCE,
    ExpressionRule,
    Id,
    LambdaFunction,
    OutputExpression,
    Rule,
    RuleSet,
    RuleSuite,
    RuleSuiteMap,
    RunOnPassProcessor,
)

RULES_SCHEMA = T.StructType(
    [
        T.StructField("ruleSuiteId", T.IntegerType(), False),
        T.StructField("ruleSuiteVersion", T.IntegerType(), False),
        T.StructField("ruleSetId", T.IntegerType(), False),
        T.StructField("ruleSetVersion", T.IntegerType(), False),
        T.StructField("ruleId", T.IntegerType(), False),
        T.StructField("ruleVersion", T.IntegerType(), False),
        T.StructField("ruleExpr", T.StringType(), False),
        T.StructField("ruleEngineSalience", T.IntegerType(), True),
        T.StructField("ruleEngineId", T.IntegerType(), True),
        T.StructField("ruleEngineVersion", T.IntegerType(), True),
    ]
)

LAMBDAS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("ruleExpr", T.StringType(), False),
        T.StructField("functionId", T.IntegerType(), False),
        T.StructField("functionVersion", T.IntegerType(), False),
        T.StructField("ruleSuiteId", T.IntegerType(), False),
        T.StructField("ruleSuiteVersion", T.IntegerType(), False),
    ]
)

OUTPUT_EXPRESSIONS_SCHEMA = T.StructType(
    [
        T.StructField("ruleExpr", T.StringType(), False),
        T.StructField("functionId", T.IntegerType(), False),
        T.StructField("functionVersion", T.IntegerType(), False),
        T.StructField("ruleSuiteId", T.IntegerType(), False),
        T.StructField("ruleSuiteVersion", T.IntegerType(), False),
    ]
)


def read_rules_from_df(df: DataFrame) -> RuleSuiteMap:
    """Load rule rows into suites (reference: serializing.scala:271-328).

    Engine columns (``ruleEngineSalience/Id/Version``) are optional; when
    present and non-zero they attach a :class:`RunOnPassProcessor` whose
    output expression is resolved later by
    :func:`integrate_output_expressions`."""
    cols = set(df.columns)
    has_engine = {"ruleEngineSalience", "ruleEngineId", "ruleEngineVersion"} <= cols

    suites: Dict[Id, Dict[Id, List[Rule]]] = {}
    for row in df.collect():
        suite_id = Id(row["ruleSuiteId"], row["ruleSuiteVersion"])
        set_id = Id(row["ruleSetId"], row["ruleSetVersion"])
        processor = None
        if has_engine and row["ruleEngineId"] is not None:
            salience = row["ruleEngineSalience"]
            processor = RunOnPassProcessor(
                salience=DEFAULT_SALIENCE if salience is None else salience,
                id=Id(row["ruleEngineId"], row["ruleEngineVersion"] or 0),
                output=None,  # type: ignore[arg-type]  # resolved by integrate
            )
        rule = Rule(
            Id(row["ruleId"], row["ruleVersion"]),
            ExpressionRule(row["ruleExpr"]),
            processor,
        )
        suites.setdefault(suite_id, {}).setdefault(set_id, []).append(rule)

    return {
        suite_id: RuleSuite(
            id=suite_id,
            rule_sets=tuple(
                RuleSet(set_id, tuple(rules)) for set_id, rules in sets.items()
            ),
        )
        for suite_id, sets in suites.items()
    }


def read_lambdas_from_df(df: DataFrame) -> Dict[Id, List[LambdaFunction]]:
    """suiteId → lambda library (reference: serializing.scala:113-145)."""
    out: Dict[Id, List[LambdaFunction]] = {}
    for row in df.collect():
        suite_id = Id(row["ruleSuiteId"], row["ruleSuiteVersion"])
        out.setdefault(suite_id, []).append(
            LambdaFunction(
                row["name"], row["ruleExpr"], Id(row["functionId"], row["functionVersion"])
            )
        )
    return out


def read_output_expressions_from_df(
    df: DataFrame,
) -> Dict[Id, Dict[Id, OutputExpression]]:
    """suiteId → outputId → output expression
    (reference: serializing.scala:147-200)."""
    out: Dict[Id, Dict[Id, OutputExpression]] = {}
    for row in df.collect():
        suite_id = Id(row["ruleSuiteId"], row["ruleSuiteVersion"])
        out.setdefault(suite_id, {})[Id(row["functionId"], row["functionVersion"])] = (
            OutputExpression(row["ruleExpr"])
        )
    return out


GLOBAL_LIBRARY_ID = Id(0, 1)


def integrate_lambdas(
    suites: RuleSuiteMap,
    lambdas: Dict[Id, List[LambdaFunction]],
    global_library: Optional[Id] = None,
) -> RuleSuiteMap:
    """Attach lambda libraries; an optional global library id applies to
    every suite (reference: serializing.scala:49-71)."""
    glob = list(lambdas.get(global_library, [])) if global_library else []
    out: RuleSuiteMap = {}
    for suite_id, suite in suites.items():
        fns = glob + list(lambdas.get(suite_id, []))
        out[suite_id] = RuleSuite(
            id=suite.id,
            rule_sets=suite.rule_sets,
            lambda_functions=tuple(fns),
            probable_pass=suite.probable_pass,
        )
    return out


def integrate_output_expressions(
    suites: RuleSuiteMap,
    outputs: Dict[Id, Dict[Id, OutputExpression]],
    global_library: Optional[Id] = None,
) -> RuleSuiteMap:
    """Resolve each rule's RunOnPassProcessor output id against the
    output-expression tables (reference: serializing.scala:73-99)."""
    out: RuleSuiteMap = {}
    for suite_id, suite in suites.items():
        lib: Dict[Id, OutputExpression] = {}
        if global_library is not None:
            lib.update(outputs.get(global_library, {}))
        lib.update(outputs.get(suite_id, {}))

        def fix(rule: Rule) -> Rule:
            if rule.run_on_pass is None or rule.run_on_pass.output is not None:
                return rule
            expr = lib.get(rule.run_on_pass.id)
            if expr is None:
                raise ValueError(
                    f"output expression {rule.run_on_pass.id} for rule "
                    f"{rule.id} of suite {suite_id} not found"
                )
            return Rule(
                rule.id,
                rule.expression,
                RunOnPassProcessor(rule.run_on_pass.salience, rule.run_on_pass.id, expr),
            )

        out[suite_id] = RuleSuite(
            id=suite.id,
            rule_sets=tuple(
                RuleSet(rs.id, tuple(fix(r) for r in rs.rules)) for rs in suite.rule_sets
            ),
            lambda_functions=suite.lambda_functions,
            probable_pass=suite.probable_pass,
        )
    return out


def to_rule_suite_df(
    spark: SparkSession, suites: RuleSuiteMap | RuleSuite
) -> DataFrame:
    """Write suites back to the rules-row shape
    (reference: serializing.scala:334-372)."""
    if isinstance(suites, RuleSuite):
        suites = {suites.id: suites}
    rows = []
    for suite in suites.values():
        for rs in suite.rule_sets:
            for r in rs.rules:
                processor = r.run_on_pass
                rows.append(
                    (
                        suite.id.id,
                        suite.id.version,
                        rs.id.id,
                        rs.id.version,
                        r.id.id,
                        r.id.version,
                        r.expression.rule,
                        processor.salience if processor else None,
                        processor.id.id if processor else None,
                        processor.id.version if processor else None,
                    )
                )
    return spark.createDataFrame(rows, RULES_SCHEMA)


def to_output_expression_df(
    spark: SparkSession, suites: RuleSuiteMap | RuleSuite
) -> DataFrame:
    """Write each distinct output expression (by its id) back to the
    output-expressions row shape (reference: serializing.scala:374-408)."""
    if isinstance(suites, RuleSuite):
        suites = {suites.id: suites}
    rows = []
    seen = set()
    for suite in suites.values():
        for rs in suite.rule_sets:
            for r in rs.rules:
                p = r.run_on_pass
                if p is None or p.output is None:
                    continue
                key = (suite.id, p.id)
                if key in seen:
                    continue
                seen.add(key)
                rows.append(
                    (p.output.rule, p.id.id, p.id.version, suite.id.id, suite.id.version)
                )
    return spark.createDataFrame(rows, OUTPUT_EXPRESSIONS_SCHEMA)


def to_lambda_df(spark: SparkSession, suites: RuleSuiteMap | RuleSuite) -> DataFrame:
    if isinstance(suites, RuleSuite):
        suites = {suites.id: suites}
    rows = []
    for suite in suites.values():
        for fn in suite.lambda_functions:
            rows.append(
                (fn.name, fn.rule, fn.id.id, fn.id.version, suite.id.id, suite.id.version)
            )
    return spark.createDataFrame(rows, LAMBDAS_SCHEMA)
