"""to_yaml / from_yaml round-trips + expressionRunner yaml rendering."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import yaml as pyyaml
from pyspark.sql import functions as F

from quality_spark.functions.yamlenc import from_yaml, to_yaml


def test_yaml_scalar_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "hello", 2.5, True), (2, None, -1.0, False)],
        "id int, s string, d double, b boolean",
    )
    for col, ddl in [("s", "string"), ("d", "double"), ("b", "boolean")]:
        out = df.select(
            F.col(col).alias("orig"), from_yaml(to_yaml(col), ddl).alias("back")
        ).collect()
        for r in out:
            assert r["orig"] == r["back"], (col, r)


def test_yaml_nested_roundtrip(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(50)
    ddl = "struct<k:bigint,vals:array<double>,m:map<string,bigint>>"
    df = li.select(
        F.struct(
            F.col("l_orderkey").alias("k"),
            F.array("l_quantity", "l_discount").alias("vals"),
            F.create_map(F.lit("ok"), F.col("l_partkey")).alias("m"),
        ).alias("v")
    )
    out = df.select("v", from_yaml(to_yaml("v"), ddl).alias("back")).collect()
    assert len(out) == 50
    for r in out:
        assert r["v"].asDict(True) == r["back"].asDict(True)


def test_yaml_output_is_valid_yaml(spark):
    df = spark.createDataFrame([([1, 2, 3],)], "xs array<int>")
    txt = df.select(to_yaml("xs").alias("y")).collect()[0]["y"]
    assert pyyaml.safe_load(txt) == [1, 2, 3]


def test_yaml_null_stays_null(spark):
    df = spark.createDataFrame([(None,)], "s string")
    r = df.select(to_yaml("s").alias("y"), from_yaml(F.lit(None), "int").alias("b")).collect()[0]
    assert r["y"] is None and r["b"] is None


def test_expression_runner_yaml_render(spark, sf_dir):
    from quality_spark.model import Id, Rule, RuleSet, RuleSuite
    from quality_spark.operators.expression_runner import add_expression_runner

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10)
    suite = RuleSuite(
        Id(1, 1),
        (
            RuleSet(
                Id(10, 1),
                (
                    Rule(Id(100, 1), "array(l_quantity, l_discount)"),
                    Rule(Id(101, 1), "l_orderkey"),
                ),
            ),
        ),
    )
    out = add_expression_runner(li, suite, render="yaml")
    row = out.select("expressionResults").collect()[0]["expressionResults"]
    rules = row["ruleSetResults"][(10 << 32) | 1]
    arr_res = rules[(100 << 32) | 1]
    assert arr_res["resultDDL"].startswith("array<")
    assert isinstance(pyyaml.safe_load(arr_res["result"]), list)
    key_res = rules[(101 << 32) | 1]
    assert pyyaml.safe_load(key_res["result"]) is not None


def test_yaml_malformed_input_is_null(spark):
    df = spark.createDataFrame([("{unclosed: [",), ("[1,2]",)], "y string")
    out = df.select(from_yaml("y", "array<int>").alias("v")).collect()
    assert [r["v"] for r in out] == [None, [1, 2]]


def test_from_yaml_reference_encodings(spark):
    """Reference-written YAML decodes: !!binary, native date scalars,
    and the reference's internal-int encodings (epoch-micros timestamp,
    epoch-days date — YamlEncoderExpr.scala:86-100)."""
    import datetime

    from quality_spark.functions.yamlenc import from_yaml

    df = spark.createDataFrame([("!!binary aGVsbG8=",)], "y string")
    got = df.select(from_yaml("y", "binary").alias("b")).head()["b"]
    assert bytes(got) == b"hello"

    df = spark.createDataFrame([("2021-03-04",), ("18690",)], "y string")
    vals = [r["d"] for r in df.select(from_yaml("y", "date").alias("d")).collect()]
    assert vals == [datetime.date(2021, 3, 4)] * 2

    # timestamp as internal epoch-micros int
    micros = 1_614_822_000_000_000  # 2021-03-04 01:40:00 UTC
    df = spark.createDataFrame([(str(micros),)], "y string")
    ts = df.select(from_yaml("y", "timestamp").alias("t")).head()["t"]
    assert ts is not None
    # compare in UTC irrespective of session tz
    import calendar

    assert calendar.timegm(ts.utctimetuple()) * 1_000_000 + ts.microsecond == micros

    # nested: struct with binary + date fields, reference encodings
    y = "b: !!binary aGVsbG8=\nd: 18690\n"
    df = spark.createDataFrame([(y,)], "y string")
    r = df.select(
        from_yaml("y", "struct<b:binary,d:date>").alias("s")
    ).head()["s"]
    assert bytes(r["b"]) == b"hello" and r["d"] == datetime.date(2021, 3, 4)


def test_yaml_macros_in_rule_text(spark):
    """to_yaml/from_yaml are SQL-registered in the reference
    (RuleRegistrationFunctions.scala:475-479); the macro path must make
    rule text like from_yaml(to_yaml(x), 'ddl') compile and round-trip."""
    from quality_spark.functions.lambdas import expand_sql

    sql = expand_sql(
        "from_yaml(to_yaml(named_struct('a', 5, 'b', 'x')), 'struct<a:int,b:string>')"
    )
    v = spark.sql(f"SELECT {sql} AS r").collect()[0]["r"]
    assert (v["a"], v["b"]) == (5, "x")


def test_yaml_macro_null_and_bad_ddl(spark):
    from quality_spark.functions.lambdas import expand_sql

    sql = expand_sql("to_yaml(CAST(NULL AS STRING))")
    assert spark.sql(f"SELECT {sql} AS r").collect()[0]["r"] is None
    import pytest as _pytest

    with _pytest.raises(Exception):
        expand_sql("from_yaml('a: 1', 'not a ddl <<<')")


def test_yaml_native_tagged_scalars(spark, sf_dir):
    """to_yaml_native emits the reference's snakeyaml node model
    (YamlEncoderExpr.scala:54-102): !!binary for bytes, FLOAT-tagged
    exact decimals, native datetime/date scalars — and from_yaml
    decodes every one of them back."""
    from quality_spark.functions.yamlenc import to_yaml_native

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(25)
    df = li.select(
        F.to_timestamp(F.col("l_shipdate")).alias("ts"),
        F.to_date(F.col("l_shipdate")).alias("dt"),
        F.col("l_extendedprice").cast("decimal(14,4)").alias("dec"),
        F.encode(
            F.concat("l_returnflag", "l_linestatus", F.col("l_orderkey").cast("string")),
            "utf-8",
        ).alias("bin"),
    )

    # binary gets the !!binary tag
    ytxt = df.select(to_yaml_native("bin").alias("y")).collect()[0]["y"]
    assert "!!binary" in ytxt

    # decimal renders as the exact decimal string (no double rounding)
    row = df.select("dec", to_yaml_native("dec").alias("y")).collect()[0]
    assert str(row["dec"]) in row["y"]

    for col, ddl in [
        ("ts", "timestamp"),
        ("dt", "date"),
        ("dec", "decimal(14,4)"),
        ("bin", "binary"),
    ]:
        out = df.select(
            F.col(col).alias("orig"),
            from_yaml(to_yaml_native(col), ddl).alias("back"),
        ).collect()
        assert len(out) == 25
        for r in out:
            assert r["orig"] == r["back"], (col, r)


def test_yaml_native_reference_ints(spark):
    """reference_ints=True matches the reference's internal-integer
    encodings: timestamps as epoch-micros, dates as epoch-days
    (YamlEncoderExpr.scala:86-92) — and from_yaml restores them."""
    import datetime

    from quality_spark.functions.yamlenc import to_yaml_native

    ts = datetime.datetime(2021, 3, 4, 5, 6, 7, 123456)
    d = datetime.date(2021, 3, 4)
    df = spark.createDataFrame([(ts, d)], "ts timestamp, dt date")

    rows = df.select(
        to_yaml_native("ts", reference_ints=True).alias("yts"),
        to_yaml_native("dt", reference_ints=True).alias("ydt"),
    ).collect()[0]
    epoch_us = int(
        (ts - datetime.datetime(1970, 1, 1)).total_seconds() * 1_000_000
    )
    assert pyyaml.safe_load(rows["yts"]) == epoch_us
    assert pyyaml.safe_load(rows["ydt"]) == (d - datetime.date(1970, 1, 1)).days

    back = df.select(
        from_yaml(to_yaml_native("ts", reference_ints=True), "timestamp").alias("ts2"),
        from_yaml(to_yaml_native("dt", reference_ints=True), "date").alias("dt2"),
    ).collect()[0]
    assert back["ts2"] == ts and back["dt2"] == d


def test_yaml_native_nested(spark, sf_dir):
    """Nested struct/array/map with date + decimal leaves round-trips
    through the native encoder."""
    from quality_spark.functions.yamlenc import to_yaml_native

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(20)
    ddl = "struct<d:date,p:decimal(12,2),m:map<string,bigint>,xs:array<double>>"
    df = li.select(
        F.struct(
            F.to_date("l_shipdate").alias("d"),
            F.col("l_extendedprice").cast("decimal(12,2)").alias("p"),
            F.create_map(F.lit("pk"), F.col("l_partkey")).alias("m"),
            F.array("l_quantity", "l_tax").alias("xs"),
        ).alias("v")
    )
    out = df.select("v", from_yaml(to_yaml_native("v"), ddl).alias("back")).collect()
    assert len(out) == 20
    for r in out:
        assert r["v"].asDict(True) == r["back"].asDict(True)


def test_yaml_native_nullable_ints(spark):
    """Arrow coerces a nullable int batch to float64; the declared-type
    path restores exact ints and renders null fields as null."""
    from quality_spark.functions.yamlenc import to_yaml_native

    df = spark.createDataFrame(
        [(1, 7, {"a": 1}), (2, None, {"a": None})],
        "id int, v bigint, s struct<a:bigint>",
    )
    rows = {
        r["id"]: (r["y"], r["ys"])
        for r in df.select(
            "id",
            to_yaml_native("v", ddl="bigint").alias("y"),
            to_yaml_native("s", ddl="struct<a:bigint>").alias("ys"),
        ).collect()
    }
    assert pyyaml.safe_load(rows[1][0]) == 7          # int, not 7.0
    assert isinstance(pyyaml.safe_load(rows[1][0]), int)
    assert rows[2][0] is None                          # whole-null -> NULL
    assert pyyaml.safe_load(rows[1][1]) == {"a": 1}
    assert pyyaml.safe_load(rows[2][1]) == {"a": None}  # null field -> null
