"""Static validation + missing-attribute rewrite.

Reference behavior: impl/Validation.scala:130-200 (collect-all error
taxonomy) and impl/ReplaceWithIfMissingAttributesExpr.scala:25-131.
"""

from __future__ import annotations

from pyspark.sql import types as T

from quality_spark import rule_suite
from quality_spark.plans.validation import (
    expression_attributes,
    process_if_attribute_missing,
    validate,
)

SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.DoubleType()),
        T.StructField("txt", T.StringType()),
    ]
)


def _suite(*exprs, lambdas=()):
    return rule_suite(
        (1, 1),
        [((10, 1), [((100 + i, 1), e) for i, e in enumerate(exprs)])],
        lambdas=lambdas,
    )


def test_clean_suite_no_issues(spark):
    issues = validate(SCHEMA, _suite("a > 0", "b between 0 and 1"), spark)
    assert issues == []


def test_missing_attribute(spark):
    issues = validate(SCHEMA, _suite("nope > 0"), spark)
    assert len(issues) == 1
    assert issues[0].kind == "missingAttribute"
    assert issues[0].rule_id == (100, 1)


def test_unknown_function(spark):
    issues = validate(SCHEMA, _suite("no_such_fn(a)"), spark)
    assert [i.kind for i in issues] == ["unknownFunction"]


def test_parse_error(spark):
    issues = validate(SCHEMA, _suite("a > > 0"), spark)
    assert [i.kind for i in issues] == ["parseError"]


def test_collects_all_not_first(spark):
    issues = validate(SCHEMA, _suite("nope > 0", "a > 0", "also_nope(1)"), spark)
    assert len(issues) == 2
    assert {i.rule_id for i in issues} == {(100, 1), (102, 1)}


def test_lambda_soe(spark):
    suite = _suite("boom(a)", lambdas=[("boom", "x -> boom(x) + 1", (5, 1))])
    issues = validate(SCHEMA, suite, spark, dry_run=False)
    assert [i.kind for i in issues] == ["lambdaSOE"]


def test_lambda_syntax_error_collected(spark):
    # a definition that is not a lambda literal is collected, and the
    # rule that uses it degrades to unknownFunction — validate never raises
    suite = _suite("broken(a) > 0", lambdas=[("broken", "no arrow here", (5, 1))])
    issues = validate(SCHEMA, suite, spark, dry_run=False)
    assert sorted(i.kind for i in issues) == ["lambdaSyntaxError", "unknownFunction"]


def test_dry_run_error(spark):
    # analyzes fine, fails at runtime under ANSI (cast of bad literal)
    issues = validate(SCHEMA, _suite("CAST('xx' AS INT) > 0"), spark)
    kinds = [i.kind for i in issues]
    assert kinds in (["dryRunError"], [])  # non-ANSI sessions return NULL


def test_expression_attributes():
    attrs = expression_attributes("a > 0 AND foo(b, s.c) and x -> x + d")
    assert "a" in attrs and "b" in attrs and "d" in attrs
    assert "foo" not in attrs  # call name
    assert "c" not in attrs  # qualified tail
    assert "x" not in attrs  # lambda param
    assert "s" in attrs  # struct root is a real column


def test_if_attribute_missing_picks_first_viable():
    suite = _suite("coalesce_if_attributes_missing(missing_col + 1, a + 1, b + 1)")
    out = process_if_attribute_missing(suite, ["a", "b"])
    assert out.rule_sets[0].rules[0].expression.rule == "(a + 1)"


def test_if_attribute_missing_none_viable_null():
    suite = _suite("coalesce_if_attributes_missing(m1 + 1, m2 + 1)")
    out = process_if_attribute_missing(suite, ["a"])
    assert out.rule_sets[0].rules[0].expression.rule == "NULL"


def test_if_attribute_missing_disable_variant():
    suite = _suite("coalesce_if_attributes_missing_disable(m1 + 1)")
    out = process_if_attribute_missing(suite, ["a"])
    assert out.rule_sets[0].rules[0].expression.rule == "-2"


def test_if_attribute_missing_untouched_rule_identity():
    suite = _suite("a > 0")
    out = process_if_attribute_missing(suite, ["a"])
    assert out.rule_sets[0].rules[0].expression.rule == "a > 0"


def test_lookup_discovery_and_validation(spark, lineitem):
    from quality_spark.model import Id, Rule, RuleSet, RuleSuite
    from quality_spark.plans.validation import discover_lookup_ids, validate
    from quality_spark.sources.lookups import register_map_lookup

    found = discover_lookup_ids(
        "map_lookup('countries', l_suppkey) is not null "
        "and probability_in(l_orderkey, 'seen_keys') > 0"
    )
    assert found == {"maps": {"countries"}, "blooms": {"seen_keys"}}

    register_map_lookup("countries_ok", {1: "x"})
    suite = RuleSuite(
        Id(1, 1),
        (
            RuleSet(
                Id(10, 1),
                (
                    Rule(Id(100, 1), "map_lookup('countries_ok', l_suppkey) is not null"),
                    Rule(Id(101, 1), "map_lookup('missing_map', l_suppkey) is not null"),
                    Rule(Id(102, 1), "probability_in(l_orderkey, 'missing_bloom') > 0"),
                ),
            ),
        ),
    )
    issues = validate(lineitem, suite, dry_run=False)
    kinds = sorted((i.kind, i.rule_id[0]) for i in issues)
    assert ("unknownLookup", 101) in kinds or ("unknownMapId", 101) in kinds
    assert any(k in ("unknownLookup", "unknownBloomId") and r == 102 for k, r in kinds)
    # the registered lookup produced no issue
    assert not any(r == 100 for _, r in kinds)


def test_backquoted_attributes_visible(spark):
    """Backquoted column references must count as attributes — the
    coalesce_if_attributes_missing rewrite otherwise selects
    alternatives whose quoted columns are missing (code-review
    regression)."""
    from quality_spark.plans.validation import (
        expression_attributes,
        process_if_attribute_missing,
    )

    attrs = expression_attributes("`my col` > 0 AND other + a.`tail` > 1")
    assert "my col" in attrs and "other" in attrs
    assert "tail" not in attrs  # qualified tail stays excluded

    from quality_spark.model import ExpressionRule, Id, Rule, RuleSet, RuleSuite

    suite = RuleSuite(
        Id(1, 1),
        (RuleSet(Id(10, 1), (Rule(
            Id(100, 1),
            ExpressionRule("coalesce_if_attributes_missing(`my col`, 0) > -1"),
        ),)),),
    )
    out2 = process_if_attribute_missing(suite, ["other"])
    text = out2.rule_sets[0].rules[0].expression.rule
    assert "my col" not in text and "0" in text
