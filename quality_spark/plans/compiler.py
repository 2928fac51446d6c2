"""Rule-text → Column compilation.

The only "engine" this library owns is this driver-side compiler: rule
SQL text is macro-expanded (builtin quality functions + user lambdas),
optionally type-probed against the target DataFrame, encoded to the
integer result domain, and handed to Spark as ordinary ``F.expr``
columns. Catalyst then does analysis, optimisation (subexpression
elimination across rules included — the reference goes out of its way
to keep this working, impl/RuleRunner.scala:63-68) and whole-stage
codegen exactly as it would for hand-written DataFrame code.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.lambdas import LambdaRegistry, expand_sql
from ..model import Rule, RuleSet, RuleSuite


class RuleCompilationError(ValueError):
    """A rule failed to expand or resolve; carries the rule coordinates."""


def registry_for(suite: RuleSuite, extra: Optional[LambdaRegistry] = None) -> LambdaRegistry:
    reg = LambdaRegistry()
    if extra is not None:
        for name in extra.names():
            for arity in extra.arities(name):
                params, body = extra.lookup(name, arity)  # type: ignore[misc]
                from ..model import Id, LambdaFunction

                reg.register(LambdaFunction(name, f"({', '.join(params)}) -> {body}", Id(0, 0)))
    reg.register_all(suite.lambda_functions)
    return reg


def expand_rules(suite: RuleSuite) -> List[Tuple[RuleSet, Rule, str]]:
    """Expand every rule of the suite → (ruleSet, rule, expandedSql)."""
    reg = registry_for(suite)
    out: List[Tuple[RuleSet, Rule, str]] = []
    for rs in suite.rule_sets:
        for r in rs.rules:
            try:
                out.append((rs, r, expand_sql(r.expression.rule, reg)))
            except (ValueError, RecursionError) as e:
                raise RuleCompilationError(
                    f"rule {r.id} in set {rs.id} of suite {suite.id}: {e}"
                ) from e
    return out


def probe_types(df: DataFrame, sqls: Sequence[str]) -> List[T.DataType]:
    """Resolve expression types against ``df`` — driver-side analysis
    only, no job is run. On failure, re-probes one by one so the error
    names the offending expression."""
    if not sqls:
        return []
    try:
        # one selectExpr call: a thousand-rule suite costs ONE py4j
        # round trip instead of one F.expr trip per rule (measured at
        # dq1000: 1.95 s -> 0.36 s for the probe). Falls back to the
        # per-Column path for any text the parenthesized AS form cannot
        # carry (e.g. a trailing line comment swallowing the paren).
        schema = df.selectExpr(
            *[f"({s}) AS _p{i}" for i, s in enumerate(sqls)]
        ).schema
        return [f.dataType for f in schema.fields]
    except Exception:
        pass
    try:
        schema = df.select([F.expr(s).alias(f"_p{i}") for i, s in enumerate(sqls)]).schema
        return [f.dataType for f in schema.fields]
    except Exception:
        types: List[T.DataType] = []
        for i, s in enumerate(sqls):
            try:
                types.append(df.select(F.expr(s).alias("_p")).schema.fields[0].dataType)
            except Exception as e:  # pragma: no cover - error path
                raise RuleCompilationError(
                    f"expression {i} failed to resolve against the DataFrame: "
                    f"{s!r}: {e}"
                ) from e
        return types
