"""agg_expr family + expression_runner (FIXTURES.md §2 agg suite)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quality_spark import Id, pack_id, rule_suite
from quality_spark.operators.aggregates import compile_agg_expr, rewrite_agg_exprs
from quality_spark.operators.expression_runner import (
    add_expression_runner,
    strip_result_ddl,
)


def test_compile_scalar_agg():
    sql, site = compile_agg_expr(
        ("'BIGINT'", "l_returnflag = 'R'", "sum_with(s -> s + l_quantity)",
         "results_with((s, c) -> s)")
    )
    assert site is None
    assert "sum(CAST(CASE WHEN (l_returnflag = 'R') THEN (l_quantity) END AS BIGINT)" in sql


def test_compile_inc_meanf():
    sql, _ = compile_agg_expr(("l_discount > 0", "inc()", "meanF()"))
    assert "count(CASE WHEN (l_discount > 0) THEN 1 END)" in sql
    assert "/" in sql


def test_compile_rejects_non_monoidal():
    with pytest.raises(ValueError, match="monoidal"):
        compile_agg_expr(("true", "sum_with(s -> s * 2)", "return_sum()"))


def test_map_with_lifts_site():
    sql, sites = rewrite_agg_exprs(
        "agg_expr('MAP<STRING,BIGINT>', true, map_with(l_returnflag, e -> e + 1), return_sum())"
    )
    assert len(sites) == 1
    assert sql.strip() == sites[0].placeholder
    assert sites[0].value_ddl == "BIGINT"


SUITE = rule_suite(
    (30, 1),
    [
        (
            (1, 1),
            [
                ((1, 1), "agg_expr('BIGINT', l_returnflag = 'R', sum_with(s -> s + l_quantity), results_with((s,c) -> s))"),
                ((2, 1), "agg_expr(l_discount > 0, inc(), meanF())"),
                ((3, 1), "agg_expr('MAP<STRING,BIGINT>', true, map_with(l_returnflag, e -> e + 1), return_sum())"),
            ],
        )
    ],
)


def test_expression_runner_aggregate_suite(lineitem):
    out = add_expression_runner(lineitem, SUITE, name="er")
    assert out.count() == 1
    row = out.collect()[0]["er"]
    assert row["id"] == pack_id(Id(30, 1))
    results = row["ruleSetResults"][pack_id(Id(1, 1))]

    expected_sum = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .agg(F.sum("l_quantity").cast("bigint"))
        .collect()[0][0]
    )
    r1 = results[pack_id(Id(1, 1))]
    assert r1["resultDDL"] == "bigint"
    assert int(r1["result"]) == expected_sum

    # meanF of inc() == 1.0 (sum of 1s / count)
    r2 = results[pack_id(Id(2, 1))]
    assert float(r2["result"]) == 1.0

    # map_with counts per return flag
    r3 = results[pack_id(Id(3, 1))]
    assert r3["resultDDL"].startswith("map<string,bigint")
    counts = {
        r["l_returnflag"]: r["n"]
        for r in lineitem.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    import json

    got = json.loads(r3["result"])
    assert {k: int(v) for k, v in got.items()} == counts


def test_expression_runner_per_row_rules(lineitem):
    suite = rule_suite(
        (31, 1),
        [((1, 1), [((1, 1), "l_quantity * 2"), ((2, 1), "upper(l_returnflag)")])],
    )
    out = add_expression_runner(lineitem, suite, name="er")
    assert out.count() == lineitem.count()
    row = out.select("er").first()["er"]
    results = row["ruleSetResults"][pack_id(Id(1, 1))]
    assert results[pack_id(Id(1, 1))]["resultDDL"] == "double"


def test_expression_runner_ddl_type(lineitem):
    suite = rule_suite(
        (32, 1),
        [((1, 1), [((1, 1), "agg_expr('BIGINT', true, inc(), return_sum())")])],
    )
    out = add_expression_runner(lineitem, suite, name="er", ddl_type="bigint")
    row = out.collect()[0]["er"]
    n = row["ruleSetResults"][pack_id(Id(1, 1))][pack_id(Id(1, 1))]
    assert n == lineitem.count()


def test_strip_result_ddl(lineitem):
    suite = rule_suite(
        (33, 1), [((1, 1), [((1, 1), "agg_expr('BIGINT', true, inc(), return_sum())")])]
    )
    out = add_expression_runner(lineitem, suite, name="er")
    stripped = out.select(strip_result_ddl(F.col("er")).alias("s"))
    t = stripped.schema["s"].dataType.simpleString()
    assert t == "struct<id:bigint,ruleSetResults:map<bigint,map<bigint,string>>>"


def test_agg_expr_decimal_38_18(spark, lineitem):
    """DecimalType(38,18) sums — the reference's aggregate precision
    (impl/RuleRegistrationFunctions.scala:69); results match DuckDB."""
    import duckdb
    from decimal import Decimal

    dec = lineitem.select(F.col("l_extendedprice").cast("decimal(38,18)").alias("p"))
    suite = rule_suite(
        (9, 1),
        [(
            (90, 1),
            [(
                (900, 1),
                "agg_expr('DECIMAL(38,18)', p > 0, "
                "sum_with(sum -> sum + p), results_with((sum, count) -> sum / count))",
            )],
        )],
    )
    out = add_expression_runner(dec, suite)
    row = out.collect()[0]["expressionResults"]
    res = row["ruleSetResults"][(90 << 32) | 1][(900 << 32) | 1]
    assert res["resultDDL"].startswith("decimal(38,")
    sf_dir = spark.conf.get("spark.__qs_sf_dir", "/root/testdata/sf0.001")
    want = duckdb.connect().execute(
        "SELECT sum(l_extendedprice) / count(*) FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet') WHERE l_extendedprice > 0"
    ).fetchall()[0][0]
    assert abs(Decimal(res["result"]) - Decimal(str(want))) < Decimal("0.001")


def test_bloom_agg_lifts_site():
    sql, sites = rewrite_agg_exprs("small_bloom(o_custkey, 1000, 0.01)")
    assert len(sites) == 1
    assert sql.strip() == sites[0].placeholder
    assert sites[0].kind == "small"
    sql2, sites2 = rewrite_agg_exprs("big_bloom(x, 10, 0.05, 'myid')")
    assert sites2[0].kind == "big" and sites2[0].id_sql == "'myid'"


def test_bloom_agg_arity_errors():
    with pytest.raises(ValueError, match="small_bloom"):
        rewrite_agg_exprs("small_bloom(o_custkey, 1000)")
    with pytest.raises(ValueError, match="big_bloom"):
        rewrite_agg_exprs("big_bloom(x)")


def test_small_bloom_sql_aggregate_roundtrip(spark, sf_dir):
    """Build through rule text, probe through probability_in: every
    build key must pass (no false negatives)."""
    from quality_spark.sources.lookups import (
        bloom_lookup,
        probability_in,
        register_bloom_bytes,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    suite = rule_suite(
        (40, 1),
        [((1, 1), [((1, 1), "small_bloom(o_custkey, 5000, 0.01)")])],
    )
    built = add_expression_runner(orders, suite, ddl_type="binary").head()
    (vals,) = built[0]["ruleSetResults"].values()
    (blob,) = vals.values()
    bf = bloom_lookup(blob)
    assert bf.m_bits % 8 == 0 and bf.k >= 1
    register_bloom_bytes(spark, "t_sql_bloom", blob)
    n = orders.filter(
        probability_in(F.col("o_custkey"), "t_sql_bloom") > 0
    ).count()
    assert n == orders.count()


def test_big_bloom_sql_aggregate_roundtrip(spark, sf_dir, tmp_path):
    from quality_spark.sources.bigbloom import set_bloom_file_location
    from quality_spark.sources.lookups import (
        bloom_lookup,
        probability_in,
        register_bloom_bytes,
    )

    set_bloom_file_location(str(tmp_path))
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        suite = rule_suite(
            (41, 1),
            [((1, 1), [((1, 1), "big_bloom(o_custkey, 5000, 0.01, 'aggtest')")])],
        )
        built = add_expression_runner(orders, suite, ddl_type="binary").head()
        (vals,) = built[0]["ruleSetResults"].values()
        (blob,) = vals.values()
        bb = bloom_lookup(blob)
        assert bb.root.endswith("aggtest") and len(blob) < 1024  # handle, not bitset
        register_bloom_bytes(spark, "t_sql_bigbloom", blob)
        n = orders.filter(
            probability_in(F.col("o_custkey"), "t_sql_bigbloom") > 0
        ).count()
        assert n == orders.count()
    finally:
        set_bloom_file_location(None)  # type: ignore[arg-type]


def test_map_with_null_key_skipped_not_crashing(spark):
    """A NULL map_with key must not crash map_from_entries; the NULL
    group stays out of the map but still counts as a filter hit."""
    from quality_spark.model import Id, Rule, RuleSet, RuleSuite
    from quality_spark.operators.expression_runner import add_expression_runner

    df = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), ("b", 3.0)], "k string, v double"
    )
    suite = RuleSuite(
        Id(30, 5),
        (
            RuleSet(
                Id(31, 1),
                (Rule(Id(300, 1), "agg_expr('MAP<STRING,DOUBLE>', true, map_with(k, e -> e + v), return_sum())"),),
            ),
        ),
    )
    row = add_expression_runner(df, suite, ddl_type="map<string,double>").head()
    m = list(row[0]["ruleSetResults"].values())[0]
    result = list(m.values())[0]
    assert result == {"a": 1.0, "b": 3.0}


def test_nested_placeholder_expression_resolves(spark):
    """An aggregate placeholder nested inside a larger expression must
    evaluate against the cross-joined frame, not df.agg."""
    from quality_spark.model import Id, Rule, RuleSet, RuleSuite
    from quality_spark.operators.expression_runner import add_expression_runner

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0)], "k string, v double"
    )
    suite = RuleSuite(
        Id(30, 6),
        (
            RuleSet(
                Id(31, 1),
                (
                    Rule(
                        Id(300, 1),
                        "element_at(agg_expr('MAP<STRING,DOUBLE>', true, map_with(k, e -> e + v), return_sum()), 'a')",
                    ),
                ),
            ),
        ),
    )
    row = add_expression_runner(df, suite, ddl_type="double").head()
    result = list(list(row[0]["ruleSetResults"].values())[0].values())[0]
    assert result == 3.0
