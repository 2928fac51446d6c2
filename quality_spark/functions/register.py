"""``register_quality_functions(spark)`` — expose the engine's scalar
function surface to plain ``spark.sql()`` text.

Reference: impl/RuleRegistrationFunctions.scala:153-528 registers
custom expressions into Spark's FunctionRegistry under snake_case AND
camelCase names.  Here each fixed-arity, pure-SQL macro becomes a
Spark 4 SQL UDF (``CREATE OR REPLACE TEMPORARY FUNCTION ... RETURN
<macro body>``) — the body is generated from the SAME macro functions
the rule compiler uses, so the two surfaces cannot drift.  SQL UDFs
inline into the caller's plan at analysis time: no UDF dispatch cost,
full codegen, pushdown-friendly.

Limitation: Spark rejects SQL UDFs directly under a Generate
([UNSUPPORTED_SQL_UDF_USAGE]) — project ``flatten_results(dq)`` to an
alias first, then ``LATERAL VIEW explode`` the alias.

Not registered (inherently compiler-side): variadic macros
(digest/hash/id families take an impl-name literal plus any columns),
registry-dependent lookups (map_lookup/map_contains/probability_in need
the driver-side map/bloom registries — use rule text through the
compiler, or register the lookup first and call the generated
``q_bloom_*`` UDF), and debug passthroughs (print_expr/print_code).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import SparkSession

from .macros import BUILTIN_MACROS

_DQ_DDL = (
    "STRUCT<id: BIGINT, overallResult: INT, "
    "ruleSetResults: MAP<BIGINT, STRUCT<overallResult: INT, "
    "ruleResults: MAP<BIGINT, INT>>>>"
)

# name -> (snake, camel aliases), [(param, ddl)], macro args
_SQL_UDFS: List[Tuple[Sequence[str], List[Tuple[str, str]]]] = [
    (("passed",), []),
    (("failed",), []),
    (("soft_failed", "softFailed"), []),
    (("disabled_rule", "disabledRule"), []),
    (("probability",), [("x", "INT")]),
    # soft_fail is POLYMORPHIC in rule text (boolean rule result OR a
    # probability double passed through) but a SQL UDF is monomorphic:
    # the bare name keeps the common boolean form, and the probability
    # passthrough gets its own explicit name. Under Spark 4's default
    # ANSI mode a double argument to the boolean form fails analysis
    # loudly rather than coercing — use soft_fail_prob there.
    (("soft_fail", "softFail"), [("x", "BOOLEAN")]),
    (("soft_fail_prob", "softFailProb"), [("x", "DOUBLE")]),
    (("pack_ints", "packInts"), [("i", "INT"), ("v", "INT")]),
    (("unpack",), [("l", "BIGINT")]),
    (("as_uuid", "asUuid"), [("lower", "BIGINT"), ("higher", "BIGINT")]),
    (("long_pair", "longPair"), [("lower", "BIGINT"), ("higher", "BIGINT")]),
    (
        ("long_pair_equal", "longPairEqual"),
        [
            ("a", "STRUCT<lower: BIGINT, higher: BIGINT>"),
            ("b", "STRUCT<lower: BIGINT, higher: BIGINT>"),
        ],
    ),
    (("rule_suite_result_details", "ruleSuiteResultDetails"), [("d", _DQ_DDL)]),
    (
        ("rule_result", "ruleResult"),
        [("res", _DQ_DDL), ("suite", "BIGINT"), ("rset", "BIGINT"), ("rule", "BIGINT")],
    ),
    (("flatten_results", "flattenResults"), [("dq", _DQ_DDL)]),
]


def register_quality_functions(spark: SparkSession, prefix: str = "") -> List[str]:
    """Create the SQL temporary functions; returns the names created.

    ``prefix`` namespaces the functions (e.g. ``prefix='q_'``) when the
    bare names would collide with existing catalog functions."""
    created: List[str] = []
    for names, params in _SQL_UDFS:
        macro_name = names[0].lower()
        if macro_name == "soft_fail_prob":
            macro_name = "soft_fail"  # same macro, double-typed surface
        macro = BUILTIN_MACROS[macro_name]
        body = macro(tuple(p for p, _ in params))
        sig = ", ".join(f"{p} {ddl}" for p, ddl in params)
        for name in names:
            fn = f"{prefix}{name}"
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY FUNCTION {fn}({sig}) RETURN {body}"
            )
            created.append(fn)
    return created
