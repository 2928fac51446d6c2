"""Round-trips: suite -> DataFrames -> suite must be lossless
(the reference's RoundTripTest.scala)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quality_spark.model import (
    ExpressionRule,
    Id,
    LambdaFunction,
    OutputExpression,
    Rule,
    RuleSet,
    RuleSuite,
    RunOnPassProcessor,
)
from quality_spark.sources.serializing import (
    integrate_lambdas,
    integrate_output_expressions,
    read_lambdas_from_df,
    read_output_expressions_from_df,
    read_rules_from_df,
    to_lambda_df,
    to_output_expression_df,
    to_rule_suite_df,
)


def _engine_suite() -> RuleSuite:
    out_a = OutputExpression("concat('m:', cast(o_orderkey as string))")
    out_b = OutputExpression("'fallback'")
    return RuleSuite(
        Id(7, 3),
        (
            RuleSet(
                Id(70, 1),
                (
                    Rule(
                        Id(700, 1),
                        ExpressionRule("o_totalprice > 1000"),
                        RunOnPassProcessor(5, Id(7000, 1), out_a),
                    ),
                    Rule(
                        Id(701, 2),
                        ExpressionRule("true"),
                        RunOnPassProcessor(99, Id(7001, 1), out_b),
                    ),
                ),
            ),
            RuleSet(Id(71, 1), (Rule(Id(710, 1), ExpressionRule("o_custkey >= 0")),)),
        ),
        (
            LambdaFunction("margin", "(p, d) -> p * (1 - d)", Id(50, 1)),
            LambdaFunction("margin", "p -> p * 0.9", Id(51, 1)),  # arity overload
        ),
        probable_pass=0.8,
    )


def test_full_round_trip(spark):
    suite = _engine_suite()

    rules_df = to_rule_suite_df(spark, suite)
    lambdas_df = to_lambda_df(spark, suite)
    outputs_df = to_output_expression_df(spark, suite)

    loaded = read_rules_from_df(rules_df)
    loaded = integrate_lambdas(loaded, read_lambdas_from_df(lambdas_df))
    loaded = integrate_output_expressions(
        loaded, read_output_expressions_from_df(outputs_df)
    )
    back = loaded[Id(7, 3)]

    def canon(s: RuleSuite):
        return {
            (rs.id, r.id, r.expression.rule,
             (r.run_on_pass.salience, r.run_on_pass.id, r.run_on_pass.output.rule)
             if r.run_on_pass else None)
            for rs in s.rule_sets
            for r in rs.rules
        }

    assert canon(back) == canon(suite)
    assert {(f.name, f.rule, f.id) for f in back.lambda_functions} == {
        (f.name, f.rule, f.id) for f in suite.lambda_functions
    }


def test_round_trip_is_stable(spark):
    """A second write of the loaded suite equals the first write."""
    suite = _engine_suite()
    df1 = to_rule_suite_df(spark, suite)
    loaded = read_rules_from_df(df1)
    df2 = to_rule_suite_df(spark, loaded)
    assert sorted(map(tuple, df1.collect())) == sorted(map(tuple, df2.collect()))


def test_round_trip_through_parquet(spark, tmp_path):
    """Rules persisted as parquet (the real storage path) reload intact."""
    suite = _engine_suite()
    p = str(tmp_path / "rules")
    to_rule_suite_df(spark, suite).write.mode("overwrite").parquet(p)
    loaded = read_rules_from_df(spark.read.parquet(p))
    assert Id(7, 3) in loaded
    rules = [r for rs in loaded[Id(7, 3)].rule_sets for r in rs.rules]
    assert len(rules) == 3
    sal = {r.id.id: r.run_on_pass.salience for r in rules if r.run_on_pass}
    assert sal == {700: 5, 701: 99}


def test_suggested_suite_serializes_round_trip(spark, sf_dir):
    """suggest_rules output is a first-class RuleSuite: it must
    round-trip through toRuleSuiteDF / readRulesFromDF unchanged
    (the authoring loop feeds the same loaders every other suite
    uses)."""
    from quality_spark.operators.profile import profile_columns
    from quality_spark.operators.suggest import suggest_rules
    from quality_spark.sources.serializing import (
        read_rules_from_df,
        to_rule_suite_df,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    prof = profile_columns(li, ["l_quantity", "l_discount"],
                           quantiles=(0.25, 0.95))
    suite = suggest_rules(prof, ["l_quantity", "l_discount"])
    back = read_rules_from_df(to_rule_suite_df(spark, suite))[suite.id]
    got = {
        (rs.id, r.id, r.expression.rule)
        for rs in back.rule_sets
        for r in rs.rules
    }
    want = {
        (rs.id, r.id, r.expression.rule)
        for rs in suite.rule_sets
        for r in rs.rules
    }
    assert got == want and len(want) >= 4
