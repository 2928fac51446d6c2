"""Sessionization + as-of join semantics (operators/temporal.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from quality_spark.operators.temporal import asof_join, sessionize
from quality_spark.sources.parquet_compat import read_parquet_compat

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return read_parquet_compat(spark, f"{SF}/events.parquet")


def test_sessionize_matches_python_islands(spark, events):
    one = events.filter(F.col("user_id") == 7)
    got = sorted(
        (r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(one, gap="30 minutes").collect()
    )
    rows = sorted(r["ts"] for r in one.select("ts").collect())
    sessions, cur = [], [rows[0]]
    for ts in rows[1:]:
        if (ts - cur[-1]) >= dt.timedelta(minutes=30):
            sessions.append(cur)
            cur = [ts]
        else:
            cur.append(ts)
    sessions.append(cur)
    exp = sorted(
        (s[0], s[-1] + dt.timedelta(minutes=30), len(s)) for s in sessions
    )
    assert got == exp


def test_asof_join_matches_python_scan(spark, events):
    sub = events.filter(F.col("user_id") < 5)
    clicks = sub.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = sub.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    got = {
        r["event_id"]: r["asof_event_id"]
        for r in asof_join(
            clicks, views, ["user_id"], right_cols=["event_id"], tie_col="event_id"
        ).collect()
    }
    vrows = sorted(
        ((r["user_id"], r["ts"], r["event_id"]) for r in views.collect()),
    )
    exp = {}
    for c in clicks.collect():
        cands = [
            (ts, eid)
            for (u, ts, eid) in vrows
            if u == c["user_id"] and ts <= c["ts"]
        ]
        exp[c["event_id"]] = max(cands)[1] if cands else None
    assert got == exp


def test_asof_join_no_match_is_null(spark, events):
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    never = events.filter(F.lit(False)).select("event_id", "user_id", "ts")
    out = asof_join(clicks, never, ["user_id"], right_cols=["event_id"]).collect()
    assert len(out) == clicks.count()
    assert all(r["asof_event_id"] is None for r in out)


def test_asof_join_inclusive_same_timestamp(spark, events):
    # a row joined against itself (same ts) must match: inclusive <=
    ev = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        ev, ev, ["user_id"], right_cols=["event_id"], tie_col="event_id"
    )
    rows = out.collect()
    # every left row has at least itself as a candidate
    assert all(r["asof_event_id"] is not None for r in rows)
    # the matched event is never from the future
    ts_of = {r["event_id"]: r["ts"] for r in ev.collect()}
    assert all(ts_of[r["asof_event_id"]] <= r["ts"] for r in rows)


def test_range_join_matches_quadratic(spark, events):
    from quality_spark.operators.temporal import range_join

    sub = events.filter(F.col("event_id") < 2000).select(
        "event_id", "event_type", "value"
    )
    got = {
        (r["event_id"], r["r_event_id"])
        for r in range_join(sub, sub, "value", "value", 0.05, ["event_type"])
        .filter(F.col("event_id") < F.col("r_event_id"))
        .collect()
    }
    rows = sub.collect()
    exp = {
        (a["event_id"], b["event_id"])
        for a in rows
        for b in rows
        if a["event_type"] == b["event_type"]
        and a["event_id"] < b["event_id"]
        and abs(a["value"] - b["value"]) <= 0.05
    }
    assert got == exp and len(exp) > 0


def test_range_join_no_duplicate_pairs(spark, events):
    from quality_spark.operators.temporal import range_join

    sub = events.filter(F.col("event_id") < 500).select("event_id", "value")
    out = range_join(sub, sub, "value", "value", 0.1).filter(
        F.col("event_id") < F.col("r_event_id")
    )
    assert out.count() == out.dropDuplicates(["event_id", "r_event_id"]).count()


def test_time_rollup_matches_separate_groupbys(spark, events):
    from quality_spark.operators.temporal import time_rollup

    got = {
        (r["resolution"], r["bucket_start"], r["n_events"])
        for r in time_rollup(events, resolutions=("hour", "day")).collect()
    }
    exp = set()
    for res in ("hour", "day"):
        for r in (
            events.groupBy(F.date_trunc(res, "ts").alias("b"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ):
            exp.add((res, r["b"], r["n"]))
    assert got == exp


def test_time_rollup_single_shuffle(spark, events):
    from quality_spark.operators.temporal import time_rollup

    df = time_rollup(events, resolutions=("hour", "day", "month"))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert plan.count("Exchange") == 1, plan
    assert "Expand" in plan


def test_asof_join_null_right_ts_never_matches(spark):
    left = spark.createDataFrame([(1, 1, 100)], "event_id long, k long, t long")
    right = spark.createDataFrame(
        [(10, 1, None), (11, None, 50)],
        "event_id long, k long, t long",
    )
    from quality_spark.operators.temporal import asof_join

    out = asof_join(
        left, right, ["k"], left_ts="t", right_ts="t", right_cols=["event_id"]
    ).collect()
    # NULL right ts and NULL right key are not matchable under SQL
    # comparison semantics
    assert len(out) == 1 and out[0]["asof_event_id"] is None


def test_time_rollup_null_ts_stays_per_resolution(spark):
    from quality_spark.operators.temporal import time_rollup

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00"), (2, None)], "id long, s string"
    ).select("id", F.col("s").cast("timestamp").alias("ts"))
    rows = time_rollup(df, resolutions=("hour", "day")).collect()
    null_rows = [(r["resolution"], r["n_events"]) for r in rows if r["bucket_start"] is None]
    # one NULL-bucket row per named resolution, not an indistinguishable
    # resolution=NULL pair
    assert sorted(null_rows) == [("day", 1), ("hour", 1)]
    assert all(r["resolution"] in ("hour", "day") for r in rows)


def test_interval_join_known_values(spark):
    """interval_join: overlapping pairs exactly once (no bucket
    duplicates even when an overlap spans many buckets), touching
    endpoints overlap (closed), disjoint pairs absent, keys respected."""
    from quality_spark.operators.temporal import interval_join

    left = spark.createDataFrame(
        [(1, "a", 0.0, 10.0), (2, "a", 20.0, 30.0), (3, "b", 0.0, 100.0)],
        "lid int, k string, s double, e double",
    )
    right = spark.createDataFrame(
        [
            (10, "a", 5.0, 25.0),    # overlaps 1 and 2
            (11, "a", 10.0, 12.0),   # touches 1 at endpoint 10
            (12, "a", 31.0, 40.0),   # disjoint
            (13, "b", 50.0, 60.0),   # overlaps 3 (inside, many buckets)
            (14, "b", -5.0, 0.0),    # touches 3 at 0
        ],
        "rid int, k string, s double, e double",
    )
    got = sorted(
        (r["lid"], r["r_rid"])
        for r in interval_join(
            left, right, "s", "e", "s", "e", granularity=7.0, key_cols=["k"]
        ).collect()
    )
    assert got == [(1, 10), (1, 11), (2, 10), (3, 13), (3, 14)]
    # granularity much larger than spans: same answer
    got2 = sorted(
        (r["lid"], r["r_rid"])
        for r in interval_join(
            left, right, "s", "e", "s", "e", granularity=1000.0, key_cols=["k"]
        ).collect()
    )
    assert got2 == got
    # granularity much smaller: same answer (duplicate guard works)
    got3 = sorted(
        (r["lid"], r["r_rid"])
        for r in interval_join(
            left, right, "s", "e", "s", "e", granularity=0.5, key_cols=["k"]
        ).collect()
    )
    assert got3 == got


def test_interval_join_matches_duckdb(spark, sf_dir):
    """interval_join over real event-derived intervals == DuckDB's
    nested-loop overlap join (per-(user, event_type) activity spans
    vs per-user whole spans)."""
    import duckdb

    from quality_spark.operators.temporal import interval_join
    from __spark_entry__ import _NTZ_EPOCH_SECS

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("user_id") < 40
    )
    spans = ev.groupBy("user_id", "event_type").agg(
        F.min(F.expr(_NTZ_EPOCH_SECS)).alias("s"),
        F.max(F.expr(_NTZ_EPOCH_SECS)).alias("e"),
    )
    left = spans.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", F.col("event_type").alias("l_type"), "s", "e"
    )
    right = spans.filter(
        ~F.col("event_type").isin("click", "view")
    ).select("user_id", F.col("event_type").alias("rtype"), "s", "e")
    got = sorted(
        (r["user_id"], r["l_type"], r["r_rtype"])
        for r in interval_join(
            left, right, "s", "e", "s", "e",
            granularity=86400.0, key_cols=["user_id"],
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in duckdb.connect().execute(f"""
WITH spans AS (
  SELECT user_id, event_type,
         date_diff('second', TIMESTAMP '1970-01-01', min(ts))::DOUBLE AS s,
         date_diff('second', TIMESTAMP '1970-01-01', max(ts))::DOUBLE AS e
  FROM read_parquet('{sf_dir}/events.parquet')
  WHERE user_id < 40 GROUP BY 1, 2
)
SELECT l.user_id, l.event_type, r.event_type
FROM spans l JOIN spans r
  ON l.user_id = r.user_id AND l.s <= r.e AND r.s <= l.e
WHERE l.event_type IN ('click', 'view')
  AND r.event_type NOT IN ('click', 'view')
""").fetchall()
    )
    assert got == want and len(got) > 10


# --- SCD2 merge ---------------------------------------------------------

_DIM_SCHEMA = (
    "uid long, plan string, region string, "
    "valid_from timestamp_ntz, valid_to timestamp_ntz"
)
_UPD_SCHEMA = "uid long, plan string, region string, ts timestamp_ntz"


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_scd2_semantics(spark):
    from quality_spark.operators.temporal import scd2_apply

    dim = spark.createDataFrame(
        [
            # uid 1: one closed version + a current one
            (1, "free", "eu", _ts("2024-01-01"), _ts("2024-02-01")),
            (1, "pro", "eu", _ts("2024-02-01"), None),
            # uid 2: current only, will see a no-op update
            (2, "free", "us", _ts("2024-01-15"), None),
            # uid 3: current only, untouched by the batch
            (3, "pro", "ap", _ts("2024-03-01"), None),
        ],
        _DIM_SCHEMA,
    )
    upd = spark.createDataFrame(
        [
            # uid 1: change, then a no-op repeat, then another change
            (1, "pro", "us", "2024-03-01"),
            (1, "pro", "us", "2024-03-05"),
            (1, "max", "us", "2024-03-09"),
            # uid 2: attrs identical to current -> nothing happens
            (2, "free", "us", "2024-04-01"),
            # uid 9: brand new key, two versions
            (9, "free", "eu", "2024-05-01"),
            (9, "pro", "eu", "2024-05-02"),
        ],
        "uid long, plan string, region string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = scd2_apply(dim, upd, ["uid"], ["plan", "region"])
    rows = sorted(
        (r["uid"], r["plan"], r["region"], r["valid_from"], r["valid_to"])
        for r in out.collect()
    )
    assert rows == sorted(
        [
            (1, "free", "eu", _ts("2024-01-01"), _ts("2024-02-01")),
            (1, "pro", "eu", _ts("2024-02-01"), _ts("2024-03-01")),
            (1, "pro", "us", _ts("2024-03-01"), _ts("2024-03-09")),
            (1, "max", "us", _ts("2024-03-09"), None),
            (2, "free", "us", _ts("2024-01-15"), None),
            (3, "pro", "ap", _ts("2024-03-01"), None),
            (9, "free", "eu", _ts("2024-05-01"), _ts("2024-05-02")),
            (9, "pro", "eu", _ts("2024-05-02"), None),
        ]
    )
    # SCD2 invariant preserved: exactly one current row per seen key
    cur = out.filter("valid_to IS NULL").groupBy("uid").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_bootstrap_and_validation(spark):
    import pytest

    from quality_spark.operators.temporal import scd2_apply

    empty_dim = spark.createDataFrame([], _DIM_SCHEMA)
    upd = spark.createDataFrame(
        [(7, "a", "x", _ts("2024-01-01")), (7, "b", "x", _ts("2024-01-02"))],
        _UPD_SCHEMA,
    )
    out = scd2_apply(empty_dim, upd, ["uid"], ["plan", "region"]).collect()
    assert len(out) == 2
    assert sorted((r["plan"], r["valid_to"] is None) for r in out) == [
        ("a", False), ("b", True)
    ]
    with pytest.raises(ValueError, match="non-empty"):
        scd2_apply(empty_dim, upd, [], ["plan"])
    with pytest.raises(ValueError, match="missing column"):
        scd2_apply(empty_dim, upd, ["uid"], ["nope"])


def test_scd2_duckdb_parity(spark, sf_dir):
    import duckdb

    from quality_spark.operators.temporal import (
        scd2_apply,
        scd2_apply_oracle_sql,
    )

    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .select(
            "user_id", "event_type", "value",
            F.col("ts").alias("valid_from"),
            F.lit(None).cast(dict(ev.dtypes)["ts"]).alias("valid_to"),
        )
    )
    upd = ev.filter(F.col("event_id") % 3 == 0)
    out = scd2_apply(
        dim, upd, ["user_id"], ["event_type", "value"],
        order_cols=["ts", "event_id"],
    )
    got = sorted(map(tuple, out.collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    dim_sql = """
SELECT user_id, event_type, value, ts AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to
FROM (SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events)
WHERE rn = 1
"""
    sql = scd2_apply_oracle_sql(
        dim_sql,
        "SELECT * FROM events WHERE event_id % 3 = 0",
        ["user_id"], ["event_type", "value"],
        order_cols=["ts", "event_id"],
        order_sqltypes=["TIMESTAMP", "BIGINT"],
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert len(got) > 0 and got == want
