"""Debug introspection helpers — the engine's analogue of the
reference's print_expr / print_code expressions
(impl/RuleRegistrationFunctions.scala:519-527).

This engine emits no codegen of its own; every runner is an ordinary
Column tree, so "the generated code" is whatever Catalyst produces for
the final plan.  These helpers surface it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from ..model import RuleSuite

__all__ = ["expression_tree", "generated_code", "explain_runner"]


def expression_tree(c: Column) -> str:
    """The resolved-on-use expression string of a Column."""
    try:
        return c._jc.expr().toString()  # type: ignore[attr-defined]
    except Exception:
        return str(c)


def generated_code(df: DataFrame) -> str:
    """Whole-stage-codegen Java for a DataFrame's plan
    (``explain('codegen')`` as a string)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )


def explain_runner(df: DataFrame, suite: RuleSuite, mode: str = "formatted") -> str:
    """Plan for ``df`` + the suite's DQ column, as a string — quick way
    to eyeball pushdown/codegen boundaries for a rule suite."""
    from ..operators.runner import add_data_quality

    out = add_data_quality(df, suite)
    return out._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        out._jdf.queryExecution(), mode
    )
