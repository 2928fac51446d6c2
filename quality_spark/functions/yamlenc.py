"""``to_yaml`` / ``from_yaml`` — YAML rendering of arbitrary columns.

Reference: impl/yaml/YamlEncoderExpr.scala:24-259 (encode) and
impl/yaml/YamlDecoderExpr.scala:20-195 (decode), where a custom
expression walks InternalRows with snakeyaml.  Here the type-aware
halves stay JVM-side — ``to_json`` / ``from_json`` handle the Spark
type system, codegen, and nullability — and Python only re-serializes
between JSON and YAML text through an Arrow-vectorized pandas UDF
(string -> string, no per-row Python objects besides the parsed doc).

Fidelity caveats vs the reference: dates/timestamps/decimals/binary
render as their JSON string/number forms, not native YAML tags; YAML
input using such tags decodes via its JSON-compatible representation
only.  For engine-internal purposes (expressionRunner rendering,
round-trips through ``from_yaml``) this is lossless because both
directions share the JSON convention.
"""

from __future__ import annotations

import json
from typing import Optional, Union

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

ColumnOrName = Union[Column, str]

_WRAP = "__v"


def _col(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


@pandas_udf(T.StringType())
def _json_to_yaml(s):  # type: ignore[no-untyped-def]
    import pandas as pd
    import yaml

    def conv(x):
        if x is None:
            return None
        # a NULL input value serializes as '{}' (to_json drops null
        # struct fields); the when() around the UDF maps it back to
        # NULL, but the UDF still runs on every row — tolerate it here
        obj = json.loads(x).get(_WRAP)
        return yaml.safe_dump(obj, default_flow_style=False, sort_keys=False)

    return s.map(conv)


@pandas_udf(T.StringType())
def _yaml_to_json(s):  # type: ignore[no-untyped-def]
    import pandas as pd
    import yaml

    def conv(x):
        if x is None:
            return None
        try:
            return json.dumps({_WRAP: yaml.safe_load(x)}, default=str)
        except yaml.YAMLError:
            # malformed input -> NULL, matching from_json's PERMISSIVE
            # behavior rather than failing the task
            return None

    return s.map(conv)


def to_yaml(c: ColumnOrName) -> Column:
    """YAML text of any column value (NULL stays NULL).

    The value is serialized to JSON JVM-side (wrapped in a one-field
    struct so scalars work too), then re-rendered as YAML in one
    vectorized pass."""
    wrapped = F.to_json(F.struct(_col(c).alias(_WRAP)))
    # to_json drops null struct fields: struct(NULL) -> '{}' -> key error;
    # map the whole-null case back to NULL explicitly.
    return F.when(_col(c).isNull(), F.lit(None).cast("string")).otherwise(
        _json_to_yaml(wrapped)
    )


def from_yaml(c: ColumnOrName, ddl: Union[str, T.DataType]) -> Column:
    """Parse YAML text into the given DDL type (inverse of to_yaml)."""
    dtype = T._parse_datatype_string(ddl) if isinstance(ddl, str) else ddl
    schema = T.StructType([T.StructField(_WRAP, dtype, True)])
    parsed = F.from_json(_yaml_to_json(_col(c)), schema)
    return parsed[_WRAP]
