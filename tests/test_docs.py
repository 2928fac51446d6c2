"""Doc-comment parsing + markdown generation + compile-through."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quality_spark.model import Id, LambdaFunction, Rule, RuleSet, RuleSuite
from quality_spark.plans.docs import Docs, docs_markdown, parse_docs, strip_comments

DOCUMENTED = """/** Quantity must be positive.
 * @param l_quantity the line quantity
 * @return boolean pass/fail
 */
l_quantity > 0"""


def test_parse_docs_scaladoc_style():
    d = parse_docs(DOCUMENTED)
    assert d == Docs(
        "Quantity must be positive.",
        {"l_quantity": "the line quantity"},
        "boolean pass/fail",
    )
    assert strip_comments(DOCUMENTED) == "l_quantity > 0"


def test_parse_docs_markdown_style_left_alone():
    sql = "/** plain description\nno gutters here */ 1 + 1"
    d = parse_docs(sql)
    assert d.description.startswith("plain description")
    assert strip_comments(sql) == "1 + 1"


def test_no_docs():
    assert parse_docs("l_quantity > 0") is None
    assert strip_comments("l_quantity > 0") == "l_quantity > 0"
    # a doc NOT at the start is not a rule doc
    assert parse_docs("1 + /** x */ 1") is None


def test_documented_rule_still_compiles(spark, lineitem):
    from quality_spark.operators.runner import add_data_quality

    suite = RuleSuite(Id(1, 1), (RuleSet(Id(10, 1), (Rule(Id(100, 1), DOCUMENTED),)),))
    out = add_data_quality(lineitem.limit(5), suite).collect()
    assert len(out) == 5


def test_markdown_generation():
    suite = RuleSuite(
        Id(1, 1),
        (RuleSet(Id(10, 1), (Rule(Id(100, 1), DOCUMENTED),)),),
        (LambdaFunction("margin", "/** net of discount */ x -> x * 0.9", Id(7, 1)),),
    )
    md = docs_markdown(suite)
    assert "Quantity must be positive." in md
    assert "| l_quantity | the line quantity |" in md
    assert "l_quantity > 0" in md
    assert "### margin (7 v1)" in md
    assert "net of discount" in md
    assert "/**" not in md.split("```sql")[1].split("```")[0]
