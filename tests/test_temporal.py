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
