"""Python-level Column helpers mirroring the SQL macro surface.

Users writing DataFrame code (not rule text) get the same functions as
ordinary ``Column`` factories. Each delegates to the macro rewrites in
:mod:`quality_spark.functions.macros` so SQL-text rules and Python code
share one implementation.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import DISABLED_RULE_INT, FAILED_INT, PASSED_INT, SOFT_FAILED_INT
from .macros import BUILTIN_MACROS

ColumnOrName = Union[Column, str]


from ..expr import sql_of_column as _sql_of  # canonical bridge


def _macro(name: str, *cols: ColumnOrName) -> Column:
    fn = BUILTIN_MACROS[name]
    return F.expr(fn(tuple(_sql_of(c) for c in cols)))


def passed() -> Column:
    return F.lit(PASSED_INT)


def failed() -> Column:
    return F.lit(FAILED_INT)


def soft_failed() -> Column:
    return F.lit(SOFT_FAILED_INT)


def disabled_rule() -> Column:
    return F.lit(DISABLED_RULE_INT)


def probability(c: ColumnOrName) -> Column:
    return _macro("probability", c)


def soft_fail(c: ColumnOrName) -> Column:
    return _macro("soft_fail", c)


def pack_ints(i: ColumnOrName, v: ColumnOrName) -> Column:
    return _macro("pack_ints", i, v)


def unpack(c: ColumnOrName) -> Column:
    return _macro("unpack", c)


def unpack_id_triple(c: ColumnOrName) -> Column:
    return _macro("unpack_id_triple", c)


def rule_suite_result_details(c: ColumnOrName) -> Column:
    return _macro("rule_suite_result_details", c)


def rule_result(
    res: ColumnOrName, suite: ColumnOrName, rset: ColumnOrName, rule: ColumnOrName
) -> Column:
    return _macro("rule_result", res, suite, rset, rule)


def flatten_results(c: ColumnOrName) -> Column:
    return _macro("flatten_results", c)


def flatten_rule_results(c: ColumnOrName) -> Column:
    """Flatten a ruleEngineRunner output struct; each row also carries
    the salient rule triple and the engine result."""
    return _macro("flatten_rule_results", c)


def flatten_folder_results(c: ColumnOrName) -> Column:
    """Flatten a ruleFolderRunner output struct; each row also carries
    the folded result struct (reference: RuleRunnerImports.scala:118)."""
    return _macro("flatten_folder_results", c)


def as_uuid(lower: ColumnOrName, higher: ColumnOrName) -> Column:
    return _macro("as_uuid", lower, higher)


def long_pair(lower: ColumnOrName, higher: ColumnOrName) -> Column:
    return _macro("long_pair", lower, higher)


def long_pair_from_uuid(c: ColumnOrName) -> Column:
    return _macro("long_pair_from_uuid", c)


# ---------------------------------------------------------------------------
# comparable_maps — schema-recursive rewrite of map columns to sorted
# entry arrays so sort/distinct/group/set-ops work on them
# (reference: impl/util/ComparableMapConverter.scala:17-193)
# ---------------------------------------------------------------------------


def _comparable(dtype: T.DataType, col: Column) -> Column:
    if isinstance(dtype, T.MapType):
        entries = F.map_entries(col)
        entries = F.transform(
            entries,
            lambda e: F.struct(
                _comparable(dtype.keyType, e["key"]).alias("key"),
                _comparable(dtype.valueType, e["value"]).alias("value"),
            ),
        )
        return F.array_sort(entries)
    if isinstance(dtype, T.StructType):
        return F.struct(
            *[
                _comparable(f.dataType, col[f.name]).alias(f.name)
                for f in dtype.fields
            ]
        )
    if isinstance(dtype, T.ArrayType):
        return F.transform(col, lambda e: _comparable(dtype.elementType, e))
    return col


def _reverse(dtype: T.DataType, col: Column) -> Column:
    """Inverse of :func:`_comparable` given the *original* map-bearing type."""
    if isinstance(dtype, T.MapType):
        rebuilt = F.transform(
            col,
            lambda e: F.struct(
                _reverse(dtype.keyType, e["key"]).alias("key"),
                _reverse(dtype.valueType, e["value"]).alias("value"),
            ),
        )
        return F.map_from_entries(rebuilt)
    if isinstance(dtype, T.StructType):
        return F.struct(
            *[_reverse(f.dataType, col[f.name]).alias(f.name) for f in dtype.fields]
        )
    if isinstance(dtype, T.ArrayType):
        return F.transform(col, lambda e: _reverse(dtype.elementType, e))
    return col


def comparable_maps(df: DataFrame) -> DataFrame:
    """Rewrite every (possibly nested) map column into sorted arrays of
    key/value structs, making the frame usable with ``sort``,
    ``distinct``, ``groupBy``, ``union``/``except``."""
    return df.select(
        *[
            _comparable(f.dataType, F.col(f.name)).alias(f.name)
            for f in df.schema.fields
        ]
    )


def reverse_comparable_maps(df: DataFrame, original_schema: T.StructType) -> DataFrame:
    """Undo :func:`comparable_maps` given the original schema."""
    return df.select(
        *[
            _reverse(f.dataType, F.col(f.name)).alias(f.name)
            for f in original_schema.fields
        ]
    )


def update_field(struct: Column, path: str, value: Column) -> Column:
    """Struct lens set — nested paths use dots
    (reference: impl/RuleRegistrationFunctions.scala:505-510; maps to the
    built-in ``Column.withField``)."""
    return struct.withField(path, value)


def drop_field(struct: Column, *paths: str) -> Column:
    return struct.dropFields(*paths)
