"""Cohort retention + funnel conversion (operators/analytics.py):
known-value semantics and DuckDB parity on real events."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from quality_spark.operators.analytics import (
    cohort_matrix,
    cohort_matrix_oracle_sql,
    funnel,
    funnel_oracle_sql,
)

_EV = "user_id long, event_type string, ts timestamp_ntz"


def _t(s):
    return dt.datetime.fromisoformat(s)


def test_cohort_known_values(spark):
    # week of 2024-01-01 is Mon Jan 1; week of Jan 8 next
    ev = spark.createDataFrame(
        [
            (1, "view", _t("2024-01-02 10:00")),   # cohort w1
            (1, "view", _t("2024-01-03 10:00")),   # same bucket, dedup
            (1, "click", _t("2024-01-09 10:00")),  # retained w2
            (2, "view", _t("2024-01-10 10:00")),   # cohort w2
            (3, "view", _t("2024-01-02 23:00")),   # cohort w1, w1 only
        ],
        _EV,
    )
    got = {
        (r["cohort_start"], r["bucket_start"]): r["n_users"]
        for r in cohort_matrix(ev).collect()
    }
    w1, w2 = _t("2024-01-01 00:00"), _t("2024-01-08 00:00")
    assert got == {(w1, w1): 2, (w1, w2): 1, (w2, w2): 1}
    with pytest.raises(ValueError, match="bucket"):
        cohort_matrix(ev, bucket="fortnight")


def test_funnel_known_values(spark):
    ev = spark.createDataFrame(
        [
            # u1 completes view -> click -> purchase in order
            (1, "view", _t("2024-01-01 10:00")),
            (1, "click", _t("2024-01-01 11:00")),
            (1, "purchase", _t("2024-01-01 12:00")),
            # u2 clicks BEFORE viewing: reaches view only
            (2, "click", _t("2024-01-01 09:00")),
            (2, "view", _t("2024-01-01 10:00")),
            # u3 views + clicks, never purchases
            (3, "view", _t("2024-01-01 08:00")),
            (3, "click", _t("2024-01-01 09:00")),
            # u4 purchase only: reaches nothing
            (4, "purchase", _t("2024-01-01 10:00")),
        ],
        _EV,
    )
    steps = [
        ("view", "event_type = 'view'"),
        ("click", "event_type = 'click'"),
        ("purchase", "event_type = 'purchase'"),
    ]
    got = {r["name"]: r["n_users"] for r in funnel(ev, steps).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}
    # 60-minute window: u1/u3 click at exactly +3600s (boundary is
    # INCLUSIVE), u1's purchase at +7200s falls out
    tight = {
        r["name"]: r["n_users"]
        for r in funnel(ev, steps, within=3600).collect()
    }
    assert tight == {"view": 3, "click": 2, "purchase": 0}
    with pytest.raises(ValueError, match="non-empty"):
        funnel(ev, [])


def test_analytics_duckdb_parity(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    got = sorted(map(tuple, cohort_matrix(ev).collect()))
    want = sorted(map(tuple, con.execute(cohort_matrix_oracle_sql()).fetchall()))
    assert len(got) > 0 and got == want

    steps = [
        ("signup", "event_type = 'signup'"),
        ("view", "event_type = 'view'"),
        ("purchase", "event_type = 'purchase'"),
    ]
    for within in (None, 86400):
        gf = sorted(
            map(tuple, funnel(ev, steps, within=within).collect())
        )
        wf = sorted(
            map(
                tuple,
                con.execute(funnel_oracle_sql(steps, within=within)).fetchall(),
            )
        )
        assert gf == wf
        # funnel reach is monotone non-increasing
        ns = [n for _, _, n in sorted(gf)]
        assert ns == sorted(ns, reverse=True) and ns[0] > 0


def test_count_anomalies_known_and_parity(spark, sf_dir):
    from quality_spark.operators.analytics import (
        count_anomalies,
        count_anomalies_oracle_sql,
    )

    # 6 calm hours of 10 events, then a 100-event spike, then calm
    rows = []
    eid = 0
    for h in range(8):
        n = 100 if h == 6 else 10
        for i in range(n):
            rows.append((eid, _t(f"2024-01-01 {h:02d}:00") ))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz")
    got = {
        r["bucket_start"].hour: (r["n"], r["flag"])
        for r in count_anomalies(ev, window=4, k=3).collect()
    }
    # hours 0-3: no full 4-bucket baseline -> NULL flag
    for h in range(4):
        assert got[h] == (10, None)
    assert got[4] == (10, False) and got[5] == (10, False)
    assert got[6] == (100, True)   # the spike
    # hour 7: baseline now CONTAINS the spike (variance explodes) ->
    # 10 is within 3 sigma of mean 32.5
    assert got[7] == (10, False)
    import pytest

    with pytest.raises(ValueError, match="bucket"):
        count_anomalies(ev, bucket="fortnight")
    with pytest.raises(ValueError, match="window"):
        count_anomalies(ev, window=1)

    import duckdb

    real = spark.read.parquet(f"{sf_dir}/events.parquet")
    g = sorted(map(tuple, count_anomalies(real, window=6, k=2).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    w = sorted(
        map(
            tuple,
            con.execute(
                count_anomalies_oracle_sql(window=6, k=2)
            ).fetchall(),
        )
    )
    assert len(g) > 10 and g == w
