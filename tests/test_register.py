"""register_quality_functions: the scalar surface in plain spark.sql."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F

from quality_spark.functions.register import register_quality_functions
from quality_spark.model import Id, PASSED_INT, Rule, RuleSet, RuleSuite
from quality_spark.operators.runner import add_data_quality


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    register_quality_functions(spark)


def test_scalar_functions_in_sql(spark):
    row = spark.sql(
        "SELECT passed() p, failed() f, probability(80000) pr, "
        "unpack(pack_ints(12, 4)) u, soft_fail(false) sf"
    ).collect()[0]
    assert (row["p"], row["f"], row["pr"]) == (PASSED_INT, 0, 0.8)
    assert (row["u"]["id"], row["u"]["version"]) == (12, 4)
    assert row["sf"] == -1.0


def test_sql_surface_matches_compiler_surface(spark, lineitem):
    """The SQL UDF bodies are generated from the same macros the rule
    compiler expands — spot-check equality on real data."""
    out = lineitem.limit(200).select(
        F.expr("soft_fail(l_quantity > 25)").alias("sql_side"),
    )
    from quality_spark.functions.macros import BUILTIN_MACROS

    macro_sql = BUILTIN_MACROS["soft_fail"](("l_quantity > 25",))
    out2 = lineitem.limit(200).select(F.expr(macro_sql).alias("macro_side"))
    assert [r[0] for r in out.collect()] == [r[0] for r in out2.collect()]


def test_flatten_and_rule_result_in_pure_sql(spark, lineitem):
    """Stored DQ structs are queryable with no Python imports at all."""
    suite = RuleSuite(
        Id(5, 2),
        (RuleSet(Id(50, 1), (Rule(Id(500, 1), "l_quantity > 25"),)),),
    )
    add_data_quality(lineitem.limit(100), suite).createOrReplaceTempView("dq_stored")
    # SQL UDFs cannot appear directly under a Generate
    # ([UNSUPPORTED_SQL_UDF_USAGE]) — project first, then explode.
    flat = spark.sql(
        "SELECT f.ruleId, f.ruleResult FROM "
        "(SELECT flatten_results(DQ) AS fr FROM dq_stored) "
        "LATERAL VIEW explode(fr) t AS f"
    ).collect()
    assert len(flat) == 100 and {r["ruleId"] for r in flat} == {500}

    looked = spark.sql(
        "SELECT rule_result(DQ, pack_ints(5, 2), pack_ints(50, 1), pack_ints(500, 1)) AS r "
        "FROM dq_stored"
    ).collect()
    assert set(r["r"] for r in looked) <= {PASSED_INT, 0}
    assert [r["r"] for r in looked] == [r["ruleResult"] for r in flat]


def test_prefix_namespacing(spark):
    names = register_quality_functions(spark, prefix="q_")
    assert "q_passed" in names
    assert spark.sql("SELECT q_passed()").collect()[0][0] == PASSED_INT


def test_soft_fail_prob_passthrough(spark):
    """The double-typed SQL surface passes probabilities through
    unchanged (the boolean form would coerce or reject them)."""
    from quality_spark.functions.register import register_quality_functions

    register_quality_functions(spark, prefix="t2_")
    row = spark.sql(
        "SELECT t2_soft_fail_prob(0.9) AS a, t2_softFailProb(-2.0) AS b, "
        "t2_soft_fail(1 > 2) AS c, t2_softFail(2 > 1) AS d"
    ).first()
    assert (row["a"], row["b"], row["c"], row["d"]) == (0.9, -2.0, -1.0, 1.0)
