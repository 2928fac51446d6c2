"""Rule metadata model.

A brand-new PySpark-native take on the reference's rule model
(reference: src/main/scala/com/sparkutils/quality/Rule.scala:17-110,
impl/RuleRunner.scala:24-42 for id packing). Rules are *data*: SQL
expression strings grouped into versioned sets and suites. The engine
compiles them on the driver into ordinary ``pyspark.sql.Column`` trees.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Dict, Iterable, List, Optional, Tuple

# Result encoding constants (reference: impl/imports/RuleRunnerImports.scala:57-60)
PASSED_INT = 100000
FAILED_INT = 0
SOFT_FAILED_INT = -1
DISABLED_RULE_INT = -2

#: salience used when a rule has no explicit engine salience
#: (reference: impl/util/SerializationModel.scala RuleRow default)
DEFAULT_SALIENCE = 1234567890


@dataclass(frozen=True, order=True)
class Id:
    """Versioned identity of every object (reference: Rule.scala:17)."""

    id: int
    version: int

    def packed(self) -> int:
        return pack_id(self)


def pack_id(i: Id) -> int:
    """``(id << 32) | (version & 0xffffffff)`` as a signed 64-bit value.

    Reference: impl/RuleRunner.scala:27-30 (PackId.packId).
    """
    v = (int(i.id) << 32) | (int(i.version) & 0xFFFFFFFF)
    # wrap to signed 64-bit like the JVM long
    v &= 0xFFFFFFFFFFFFFFFF
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def unpack_id(packed: int) -> Id:
    """Inverse of :func:`pack_id` (reference: impl/RuleRunner.scala:33-42)."""
    p = int(packed) & 0xFFFFFFFFFFFFFFFF
    id_ = p >> 32
    if id_ >= 1 << 31:
        id_ -= 1 << 32
    version = p & 0xFFFFFFFF
    if version >= 1 << 31:
        version -= 1 << 32
    return Id(id_, version)


@dataclass(frozen=True)
class ExpressionRule:
    """Rule logic as SQL text, parsed lazily (reference: Rule.scala:27)."""

    rule: str


@dataclass(frozen=True)
class OutputExpression:
    """Output logic; ``set(field = expr, …)`` sugar supported
    (reference: Rule.scala:35-69)."""

    rule: str


@dataclass(frozen=True)
class RunOnPassProcessor:
    """Output expression + salience priority — lower wins
    (reference: impl/RuleImpl.scala:358-400)."""

    salience: int
    id: Id
    output: OutputExpression


#: sentinel for "no output processor"
NO_OP_PROCESSOR: Optional[RunOnPassProcessor] = None


@dataclass(frozen=True)
class Rule:
    """One rule = one SQL expression + optional output processor
    (reference: Rule.scala:90)."""

    id: Id
    expression: ExpressionRule
    run_on_pass: Optional[RunOnPassProcessor] = None

    def __post_init__(self) -> None:
        # Accept bare SQL text — a plain-string expression otherwise fails
        # far from the construction site.
        if isinstance(self.expression, str):
            object.__setattr__(self, "expression", ExpressionRule(self.expression))


@dataclass(frozen=True)
class RuleSet:
    """Grouping of rules (reference: Rule.scala:92)."""

    id: Id
    rules: Tuple[Rule, ...] = ()


@dataclass(frozen=True)
class LambdaFunction:
    """Reusable, versioned SQL lambda, overloadable by arity
    (reference: impl/RuleImpl.scala:168-182)."""

    name: str
    rule: str
    id: Id


@dataclass(frozen=True)
class RuleSuite:
    """Top-level unit; carries the lambda library and the
    probability-pass threshold (reference: Rule.scala:101-110)."""

    id: Id
    rule_sets: Tuple[RuleSet, ...] = ()
    lambda_functions: Tuple[LambdaFunction, ...] = ()
    probable_pass: float = 0.8

    def with_probable_pass(self, p: float) -> "RuleSuite":
        return replace(self, probable_pass=p)

    def all_rules(self) -> Iterable[Tuple[RuleSet, Rule]]:
        for rs in self.rule_sets:
            for r in rs.rules:
                yield rs, r


def rule_suite(
    suite_id: Tuple[int, int],
    rule_sets: Iterable[Tuple[Tuple[int, int], Iterable[Tuple[Tuple[int, int], str]]]],
    lambdas: Iterable[Tuple[str, str, Tuple[int, int]]] = (),
    probable_pass: float = 0.8,
) -> RuleSuite:
    """Convenience literal constructor used by tests and docs.

    ``rule_suite((1,1), [((10,1), [((100,1), 'l_quantity > 0')])])``
    """
    return RuleSuite(
        id=Id(*suite_id),
        rule_sets=tuple(
            RuleSet(
                id=Id(*rs_id),
                rules=tuple(Rule(Id(*r_id), ExpressionRule(text)) for r_id, text in rules),
            )
            for rs_id, rules in rule_sets
        ),
        lambda_functions=tuple(LambdaFunction(n, r, Id(*i)) for n, r, i in lambdas),
        probable_pass=probable_pass,
    )


def engine_rule(
    rule_id: Tuple[int, int],
    trigger: str,
    salience: int,
    output: str,
    output_id: Tuple[int, int] = (0, 0),
) -> Rule:
    """Convenience constructor for rule-engine/folder rules: a trigger
    expression plus a salience-prioritised output expression."""
    return Rule(
        Id(*rule_id),
        ExpressionRule(trigger),
        RunOnPassProcessor(salience, Id(*output_id), OutputExpression(output)),
    )


def engine_suite(
    suite_id: Tuple[int, int],
    rule_sets: Iterable[Tuple[Tuple[int, int], Iterable[Rule]]],
    lambdas: Iterable[Tuple[str, str, Tuple[int, int]]] = (),
    probable_pass: float = 0.8,
) -> RuleSuite:
    return RuleSuite(
        id=Id(*suite_id),
        rule_sets=tuple(RuleSet(Id(*rs_id), tuple(rules)) for rs_id, rules in rule_sets),
        lambda_functions=tuple(LambdaFunction(n, r, Id(*i)) for n, r, i in lambdas),
        probable_pass=probable_pass,
    )


#: map keyed by suite Id — the loader output shape
RuleSuiteMap = Dict[Id, RuleSuite]
