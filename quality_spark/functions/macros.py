"""Builtin "quality" SQL functions as driver-side macro rewrites.

The reference registers ~60 custom Catalyst expressions into Spark's
FunctionRegistry (reference: impl/RuleRegistrationFunctions.scala:153-528).
This engine instead rewrites the rule text on the driver into plain
Spark SQL so Catalyst sees only built-in expressions — no custom
codegen, registry injection, or UDFs in the hot path.

Each macro maps ``name(args…) -> sql``. Names are matched
case-insensitively, so both snake_case and camelCase aliases work
(reference registers both: RuleRegistrationFunctions.scala:53-67).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from ..model import DISABLED_RULE_INT, FAILED_INT, PASSED_INT, SOFT_FAILED_INT

MacroFn = Callable[[Tuple[str, ...]], str]


def _low32(e: str) -> str:
    """Signed lower-32-bits of a BIGINT as INT — ANSI-mode safe (Spark 4
    defaults to ANSI, where a plain overflowing CAST errors)."""
    return (
        f"CAST((({e}) & 4294967295) - (((({e}) >> 31) & 1) * 4294967296) AS INT)"
    )


def _high32(e: str) -> str:
    return f"CAST(({e}) >> 32 AS INT)"


def _arity_error(name: str, args: Tuple[str, ...], expected: str) -> ValueError:
    return ValueError(f"{name} expects {expected} argument(s), got {len(args)}")


def _passed(args):
    if args:
        raise _arity_error("passed", args, "0")
    return str(PASSED_INT)


def _failed(args):
    if args:
        raise _arity_error("failed", args, "0")
    return str(FAILED_INT)


def _soft_failed(args):
    if args:
        raise _arity_error("soft_failed", args, "0")
    return str(SOFT_FAILED_INT)


def _disabled_rule(args):
    if args:
        raise _arity_error("disabled_rule", args, "0")
    return str(DISABLED_RULE_INT)


def _probability(args):
    # int result -> double x/100000 (reference: impl/ProbabilityExpr.scala:17-35)
    if len(args) != 1:
        raise _arity_error("probability", args, "1")
    return f"(CAST(({args[0]}) AS DOUBLE) / {PASSED_INT}.0D)"


def _soft_fail(args):
    # any failure -> -1.0 soft failure; pass -> 1.0; probability passes
    # through (reference: impl/SoftFailExpr.scala:15-24). Null propagates
    # (NullIntolerant) and the rule-level encode then treats it as Failed.
    if len(args) != 1:
        raise _arity_error("soft_fail", args, "1")
    e = args[0]
    return (
        f"(CASE WHEN ({e}) IS NULL THEN CAST(NULL AS DOUBLE) "
        f"WHEN CAST(({e}) AS DOUBLE) IN (0.0D, -1.0D) THEN -1.0D "
        f"WHEN CAST(({e}) AS DOUBLE) = -2.0D THEN -2.0D "
        f"ELSE CAST(({e}) AS DOUBLE) END)"
    )


def _pack_ints(args):
    # (id << 32) | (version & 0xffffffff) (reference: impl/PackExpression.scala:29-133)
    if len(args) != 2:
        raise _arity_error("pack_ints", args, "2")
    i, v = args
    return f"((CAST(({i}) AS BIGINT) << 32) | (CAST(({v}) AS BIGINT) & 4294967295))"


def _unpack(args):
    if len(args) != 1:
        raise _arity_error("unpack", args, "1")
    l = args[0]
    return f"named_struct('id', {_high32(l)}, 'version', {_low32(l)})"


def _unpack_id_triple(args):
    # packed (suite, set, rule) struct -> nested unpacked structs
    # (reference: impl/PackExpression.scala UnpackIdTriple)
    if len(args) != 1:
        raise _arity_error("unpack_id_triple", args, "1")
    s = args[0]
    return (
        "named_struct("
        f"'ruleSuiteId', {_high32(f'({s}).ruleSuiteId')}, "
        f"'ruleSuiteVersion', {_low32(f'({s}).ruleSuiteId')}, "
        f"'ruleSetId', {_high32(f'({s}).ruleSetId')}, "
        f"'ruleSetVersion', {_low32(f'({s}).ruleSetId')}, "
        f"'ruleId', {_high32(f'({s}).ruleId')}, "
        f"'ruleVersion', {_low32(f'({s}).ruleId')})"
    )


def _rule_suite_result_details(args):
    # strip the suite-level overallResult (reference: impl/RuleSuiteResultDetailsExpr.scala)
    if len(args) != 1:
        raise _arity_error("rule_suite_result_details", args, "1")
    d = args[0]
    return f"named_struct('id', ({d}).id, 'ruleSetResults', ({d}).ruleSetResults)"


def _rule_result(args):
    # nested lookup of one rule's result; null when absent
    # (reference: impl/RuleResultExpression.scala:17-187)
    if len(args) != 4:
        raise _arity_error("rule_result", args, "4")
    res, suite, rset, rule = args
    # subscript (GetMapValue), NOT element_at: SimplifyExtractValueOps
    # only folds GetMapValue over a freshly-built CreateMap, so this form
    # lets Catalyst collapse "build whole DQ struct, read one rule" down
    # to just that rule's expression (6.0s -> 0.9s on 600k rows); it also
    # stays null-on-missing under ANSI mode where element_at raises.
    return (
        f"(CASE WHEN ({res}) IS NULL THEN NULL "
        f"WHEN ({res}).id = ({suite}) THEN "
        f"(({res}).ruleSetResults[CAST(({rset}) AS BIGINT)].ruleResults)"
        f"[CAST(({rule}) AS BIGINT)] END)"
    )


def _flatten_entries(dq: str, with_suite_overall: bool, extra: str = "") -> str:
    # lambda variables use collision-proof names: a bare `se`/`re` would
    # shadow (capture) user columns of the same name inside the lambda
    overall = f"({dq}).overallResult" if with_suite_overall else "CAST(NULL AS INT)"
    return (
        f"flatten(transform(map_entries(({dq}).ruleSetResults), __qs_se -> "
        f"transform(map_entries(__qs_se.value.ruleResults), __qs_re -> named_struct("
        f"'ruleSuiteId', {_high32(f'({dq}).id')}, "
        f"'ruleSuiteVersion', {_low32(f'({dq}).id')}, "
        f"'ruleSuiteResult', {overall}, "
        f"'ruleSetResult', __qs_se.value.overallResult, "
        f"'ruleSetId', {_high32('__qs_se.key')}, "
        f"'ruleSetVersion', {_low32('__qs_se.key')}, "
        f"'ruleId', {_high32('__qs_re.key')}, "
        f"'ruleVersion', {_low32('__qs_re.key')}, "
        f"'ruleResult', __qs_re.value{extra}))))"
    )


def _flatten_results(args):
    # nested DQ result -> array of flat structs
    # (reference: impl/FlattenResultsExpression.scala:17-80, FlattenStruct)
    if len(args) != 1:
        raise _arity_error("flatten_results", args, "1")
    return _flatten_entries(args[0], with_suite_overall=True)


def _flatten_rule_results(args):
    # ruleEngineRunner-output variant: flattens the nested DQ and
    # appends the salient rule id triple and engine result to every row
    # (reference: FlattenRulesResultsExpression,
    # impl/FlattenResultsExpression.scala:85-126)
    if len(args) != 1:
        raise _arity_error("flatten_rule_results", args, "1")
    e = args[0]
    extra = f", 'salientRule', ({e}).salientRule, 'result', ({e}).result"
    return _flatten_entries(f"({e}).ruleSuiteResults", True, extra)


def _flatten_folder_results(args):
    # ruleFolderRunner-output variant: appends the folded result struct
    # (reference: FlattenFolderResultsExpression,
    # impl/FlattenResultsExpression.scala:144-184,
    # RuleRunnerImports.scala:118)
    if len(args) != 1:
        raise _arity_error("flatten_folder_results", args, "1")
    e = args[0]
    extra = f", 'result', ({e}).result"
    return _flatten_entries(f"({e}).ruleSuiteResults", True, extra)


def _id_equal(args):
    # id struct equality over `_base/_i0/_i1`-style fields
    # (reference: functions/package.scala:33-58)
    if len(args) != 2:
        raise _arity_error("id_equal", args, "2")
    a, b = args
    return (
        f"(({a}).base = ({b}).base AND ({a}).i0 = ({b}).i0 AND ({a}).i1 = ({b}).i1)"
    )


def _long_pair_equal(args):
    if len(args) != 2:
        raise _arity_error("long_pair_equal", args, "2")
    a, b = args
    return f"(({a}).lower = ({b}).lower AND ({a}).higher = ({b}).higher)"


def _as_uuid(args):
    # (lower: bigint, higher: bigint) -> canonical uuid string
    # (reference: impl/longPair/AsUUID.scala:10-26 — Java UUID(msb=higher, lsb=lower))
    if len(args) != 2:
        raise _arity_error("as_uuid", args, "2")
    lower, higher = args
    h = f"lpad(hex(CAST(({higher}) AS BIGINT)), 16, '0')"
    l = f"lpad(hex(CAST(({lower}) AS BIGINT)), 16, '0')"
    return (
        f"lower(concat(substring({h}, 1, 8), '-', substring({h}, 9, 4), '-', "
        f"substring({h}, 13, 4), '-', substring({l}, 1, 4), '-', substring({l}, 5, 12)))"
    )


def _long_pair(args):
    if len(args) != 2:
        raise _arity_error("long_pair", args, "2")
    lower, higher = args
    return (
        f"named_struct('lower', CAST(({lower}) AS BIGINT), "
        f"'higher', CAST(({higher}) AS BIGINT))"
    )


def _prefixed_to_long_pair(args):
    # ('prefix', struct) -> struct(lower, higher) from a 128-bit id
    # struct. The reference reads payload ordinals 1,2 of a struct with
    # fields ({prefix}_base, {prefix}_i0, {prefix}_i1) — i0 -> lower,
    # i1 -> higher (impl/longPair/LongPairExpressions.scala:46-70;
    # SQL form prefixed_To_Long_Pair('prefix', col),
    # RuleRegistrationFunctions.scala:437-446). This engine's own id
    # structs use unprefixed (base, i0, i1) fields — pass '' for those.
    if len(args) != 2:
        raise _arity_error("prefixed_to_long_pair", args, "2 ('prefix', struct)")
    p = _strip_str(args[0])
    pre = f"{p}_" if p else ""
    s = args[1]
    return (
        f"named_struct('lower', ({s}).`{pre}i0`, 'higher', ({s}).`{pre}i1`)"
    )


def _long_pair_from_uuid(args):
    # uuid string -> struct(lower, higher); inverse of as_uuid
    if len(args) != 1:
        raise _arity_error("long_pair_from_uuid", args, "1")
    u = args[0]
    hexs = f"replace(CAST(({u}) AS STRING), '-', '')"

    # rebuild each long from two 32-bit halves: conv() yields an unsigned
    # decimal string, so a full 16-hex-digit conv would overflow BIGINT for
    # values with the sign bit set; (hi << 32) | lo wraps correctly instead.
    def _long_from(start: int) -> str:
        hi = f"CAST(conv(substring({hexs}, {start}, 8), 16, 10) AS BIGINT)"
        lo = f"CAST(conv(substring({hexs}, {start + 8}, 8), 16, 10) AS BIGINT)"
        return f"(({hi} << 32) | {lo})"

    return f"named_struct('lower', {_long_from(17)}, 'higher', {_long_from(1)})"


BUILTIN_MACROS: Dict[str, MacroFn] = {}


def _register(fn: MacroFn, *names: str) -> None:
    for n in names:
        BUILTIN_MACROS[n.lower()] = fn


_register(_passed, "passed")
_register(_failed, "failed")
_register(_soft_failed, "soft_failed", "softFailed")
_register(_disabled_rule, "disabled_rule", "disabledRule")
_register(_probability, "probability")
_register(_soft_fail, "soft_fail", "softFail")
_register(_pack_ints, "pack_ints", "packInts")
_register(_unpack, "unpack")
_register(_unpack_id_triple, "unpack_id_triple", "unpackIdTriple")
_register(_rule_suite_result_details, "rule_suite_result_details", "ruleSuiteResultDetails")
_register(_rule_result, "rule_result", "ruleResult")
_register(_flatten_results, "flatten_results", "flattenResults")
_register(_flatten_rule_results, "flatten_rule_results", "flattenRuleResults")
_register(_flatten_folder_results, "flatten_folder_results", "flattenFolderResults")
_register(_id_equal, "id_equal", "idEqual")
_register(_long_pair_equal, "long_pair_equal", "longPairEqual")
_register(_as_uuid, "as_uuid", "asUuid")
_register(_long_pair, "long_pair", "longPair")
_register(_long_pair_from_uuid, "long_pair_from_uuid", "longPairFromUuid")
_register(
    _prefixed_to_long_pair,
    "prefixed_to_long_pair",
    "prefixedToLongPair",
    "prefixed_To_Long_Pair",
)


def _strip_str(arg: str) -> str:
    a = arg.strip()
    if len(a) >= 2 and a[0] == "'" and a[-1] == "'":
        return a[1:-1]
    raise ValueError(f"expected a string literal, got {arg!r}")


def _map_lookup(args):
    from ..sources.lookups import map_lookup_sql

    if len(args) != 2:
        raise _arity_error("map_lookup", args, "2")
    return map_lookup_sql(_strip_str(args[0]), args[1])


def _map_contains(args):
    from ..sources.lookups import map_contains_sql

    if len(args) != 2:
        raise _arity_error("map_contains", args, "2")
    return map_contains_sql(_strip_str(args[0]), args[1])


def _probability_in(args):
    from ..sources.lookups import probability_in_sql

    if len(args) != 2:
        raise _arity_error("probability_in", args, "2")
    return probability_in_sql(args[0], _strip_str(args[1]))


_register(_map_lookup, "map_lookup", "mapLookup")
_register(_map_contains, "map_contains", "mapContains")
_register(_probability_in, "probability_in", "probabilityIn")


def _print_expr(args):
    # debug passthrough: print the (expanded) expression at compile time,
    # evaluate to the inner expression (reference:
    # impl/RuleRegistrationFunctions.scala:519-523 prints at eval setup)
    if len(args) not in (1, 2):
        raise _arity_error("print_expr", args, "1 or 2")
    msg = _strip_str(args[1]) if len(args) == 2 else "print_expr"
    print(f"{msg}: {args[0]}")
    return f"({args[0]})"


_register(_print_expr, "print_expr", "printExpr")
# print_code prints the same compile-time expansion: this engine emits no
# custom codegen of its own (Catalyst does), so the generated-Java dump
# is `df.explain('codegen')` — see plans/debug.py helpers.
_register(_print_expr, "print_code", "printCode")


def _schema_generic(name: str, api_fn: str, note: str = ""):
    """Diagnosed compile-time error for reference functions whose
    semantics need analysis-time schema information (the reference
    implements them as Catalyst expressions that resolve with types;
    driver-side text expansion cannot). Converts an opaque Spark
    UNRESOLVED_ROUTINE into an actionable message."""

    def macro(args):
        raise ValueError(
            f"{name} is schema-generic and not available inside SQL rule "
            f"text in this engine; use the DataFrame/Column API "
            f"quality_spark.functions.api.{api_fn} instead.{note}"
        )

    return macro


_register(
    _schema_generic("update_field", "update_field"), "update_field", "updateField"
)
_register(_schema_generic("drop_field", "drop_field"), "drop_field", "dropField")
_register(
    _schema_generic("comparable_maps", "comparable_maps"),
    "comparable_maps",
    "comparableMaps",
)
_register(
    _schema_generic("reverse_comparable_maps", "reverse_comparable_maps"),
    "reverse_comparable_maps",
    "reverseComparableMaps",
)


def _processor_input_wrapper(args):
    # reference InputWrapper(left, right): a passthrough that evaluates
    # RIGHT and ignores left entirely — left exists only to force
    # resolution in the reference's interpreter plumbing
    # (impl/util/Utils.scala:549-563: eval/dataType/genCode all
    # delegate to right). Matching resolution behavior: left is kept as
    # a DEAD reference inside a false branch, so an unresolvable left
    # still fails analysis (as the reference's child expression would),
    # while BooleanSimplification + SimplifyConditionals fold the whole
    # guard away post-analysis — the optimized plan is just right.
    if len(args) != 2:
        raise _arity_error("processor_input_wrapper", args, "2 (left, right)")
    return (
        f"(if(false and (cast(({args[0]}) as string) is null), "
        f"null, ({args[1]})))"
    )


_register(
    _processor_input_wrapper, "processor_input_wrapper", "processorInputWrapper"
)


def expand_builtin(name_lower: str, args: Tuple[str, ...]) -> Optional[str]:
    fn = BUILTIN_MACROS.get(name_lower)
    if fn is None:
        return None
    return fn(args)
