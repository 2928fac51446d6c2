"""Event-stream analytics: cohort retention matrices and funnel
conversion — the two queries every product-events pipeline runs, as
single-plan DataFrame compositions with DuckDB twins.

Both operate on a (user, ts, …) event table and emit metadata-sized
results (cells / steps), with all arithmetic integer counts — nothing
to diverge between engines. Timestamps are bucketed with
``date_trunc`` (ISO Monday weeks in BOTH Spark and DuckDB).

100 TB shapes:
- :func:`cohort_matrix`: groupBy(user) for first-seen, one
  distinct(user, bucket) pass, a user-keyed join, and a cell groupBy —
  four key-partitioned exchanges, no windows, no driver data. The
  activity-distinct frame is the big one and it is already the minimal
  set (one row per user-bucket).
- :func:`funnel`: one min-aggregate per step over the step's filtered
  events joined to the previous step's reach frame (user-keyed;
  reach frames shrink monotonically) — k small shuffles for a k-step
  funnel, never a per-user event sort.

Step conditions are SQL strings evaluated verbatim in BOTH engines —
the same shared-dialect contract as rule texts everywhere else in
this repo (keep them in the ANSI intersection: comparisons, IN,
AND/OR on event columns).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cohort_matrix",
    "cohort_matrix_oracle_sql",
    "funnel",
    "funnel_oracle_sql",
    "count_anomalies",
    "count_anomalies_oracle_sql",
]

_BUCKETS = ("week", "month", "day")


def cohort_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "week",
) -> DataFrame:
    """(cohort_start, bucket_start, n_users): users whose FIRST event
    falls in ``cohort_start``'s bucket and who were active during
    ``bucket_start`` — the retention triangle. ``n_users`` is exact
    (the activity frame is distinct per (user, bucket), so the cell
    count needs no count-distinct Expand)."""
    if bucket not in _BUCKETS:
        raise ValueError(f"bucket must be one of {_BUCKETS}")
    fs = events.groupBy(F.col(user_col).alias("__u")).agg(
        F.date_trunc(bucket, F.min(ts_col)).alias("cohort_start")
    )
    act = events.select(
        F.col(user_col).alias("__u"),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket_start"),
    ).distinct()
    return (
        act.join(fs, "__u")
        .groupBy("cohort_start", "bucket_start")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


def cohort_matrix_oracle_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "week",
) -> str:
    """DuckDB twin of :func:`cohort_matrix` (date_trunc buckets are
    ISO-Monday in both engines; cast back to TIMESTAMP because
    DuckDB's date_trunc('week'/'day') narrows to DATE while Spark
    keeps the input's timestamp type)."""
    if bucket not in _BUCKETS:
        raise ValueError(f"bucket must be one of {_BUCKETS}")
    return f"""
SELECT fs.cohort_start, act.bucket_start,
       CAST(count(*) AS BIGINT) AS n_users
FROM (SELECT DISTINCT {user_col} AS u,
             CAST(date_trunc('{bucket}', {ts_col}) AS TIMESTAMP)
               AS bucket_start
      FROM {table}) act
JOIN (SELECT {user_col} AS u,
             CAST(date_trunc('{bucket}', min({ts_col})) AS TIMESTAMP)
               AS cohort_start
      FROM {table} GROUP BY {user_col}) fs
  ON act.u = fs.u
GROUP BY fs.cohort_start, act.bucket_start
"""


def funnel(
    events: DataFrame,
    steps: Sequence[tuple],
    user_col: str = "user_id",
    ts_col: str = "ts",
    within: Optional[int] = None,
) -> DataFrame:
    """(step, name, n_users) conversion counts for an ORDERED funnel:
    a user reaches step k if events matching conditions 1…k exist at
    non-decreasing timestamps (each step's time = the earliest
    qualifying event at-or-after the previous step's time — the
    standard greedy matching, which maximizes reach). ``steps`` is a
    list of (name, sql_condition). ``within`` (seconds) bounds every
    later step relative to the STEP-1 time — the classic conversion
    window."""
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    prev = None
    out = None
    for i, (name, cond) in enumerate(steps):
        se = events.filter(F.expr(cond)).select(
            F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts")
        )
        if i == 0:
            cur = se.groupBy("__u").agg(
                F.min("__ts").alias("__t"), F.min("__ts").alias("__t0")
            )
        else:
            j = se.join(prev, "__u").filter(F.col("__ts") >= F.col("__t"))
            if within is not None:
                j = j.filter(
                    F.expr(
                        f"__ts <= timestampadd(SECOND, {int(within)}, __t0)"
                    )
                )
            cur = j.groupBy("__u").agg(
                F.min("__ts").alias("__t"), F.min("__t0").alias("__t0")
            )
        row = cur.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(i + 1).cast("int").alias("step"),
            F.lit(name).alias("name"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
        prev = cur
    return out


def funnel_oracle_sql(
    steps: Sequence[tuple],
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    within: Optional[int] = None,
) -> str:
    """DuckDB twin of :func:`funnel` — one CTE per step, chained."""
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    parts = []
    for i, (_, cond) in enumerate(steps):
        if i == 0:
            parts.append(
                f"""s0 AS MATERIALIZED (
  SELECT {user_col} AS u, min({ts_col}) AS t, min({ts_col}) AS t0
  FROM {table} WHERE {cond} GROUP BY {user_col}
)"""
            )
        else:
            win = (
                f" AND e.{ts_col} <= p.t0 + INTERVAL {int(within)} SECOND"
                if within is not None
                else ""
            )
            parts.append(
                f"""s{i} AS MATERIALIZED (
  SELECT e.{user_col} AS u, min(e.{ts_col}) AS t, min(p.t0) AS t0
  FROM {table} e JOIN s{i - 1} p
    ON e.{user_col} = p.u AND e.{ts_col} >= p.t{win}
  WHERE {cond} GROUP BY e.{user_col}
)"""
            )
    sels = "\nUNION ALL\n".join(
        f"SELECT CAST({i + 1} AS INTEGER) AS step, '{name}' AS name, "
        f"CAST(count(*) AS BIGINT) AS n_users FROM s{i}"
        for i, (name, _) in enumerate(steps)
    )
    return "WITH " + ",\n".join(parts) + "\n" + sels


def count_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    bucket: str = "hour",
    window: int = 24,
    k: int = 3,
) -> DataFrame:
    """Volume-anomaly detection over an event stream, INTEGER-EXACT:
    bucket the stream (one groupBy), then flag buckets whose count
    sits more than ``k`` standard deviations from the mean of the
    ``window`` PRECEDING buckets (causal — the current bucket never
    contaminates its own baseline).

    The z-test is evaluated WITHOUT any floating point: with S = Σx
    and Q = Σx² over the W prior buckets,

        |n − S/W| > k·σ  ⟺  (W·n − S)² > k²·(W·Q − S²)

    — a DECIMAL(38,0) comparison both engines compute identically
    (operands bounded by (W·max_count)² ≲ 1e38 for hourly counts into
    the billions). Buckets without a FULL prior window get a NULL
    flag (insufficient baseline), not false.

    Output: (bucket_start, n, flag). The window runs over the BUCKET
    series — metadata-sized after the first groupBy — so the sort is
    thousands of rows regardless of stream volume."""
    if bucket not in ("hour", "day", "week", "minute"):
        raise ValueError("bucket must be minute/hour/day/week")
    if window < 2 or k < 1:
        raise ValueError("window must be >= 2 and k >= 1")
    from pyspark.sql import Window as W

    b = events.groupBy(
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket_start")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = (
        W.orderBy("bucket_start")
        .rowsBetween(-int(window), -1)
    )
    d = "decimal(38,0)"
    withs = b.select(
        "bucket_start",
        "n",
        F.count(F.lit(1)).over(w).alias("__w"),
        F.sum(F.col("n").cast(d)).over(w).alias("__s"),
        F.sum((F.col("n").cast("decimal(19,0)") * F.col("n")).cast(d))
        .over(w)
        .alias("__q"),
    )
    lhs = (
        F.lit(int(window)).cast(d) * F.col("n").cast(d) - F.col("__s")
    )
    rhs = F.lit(int(k * k)).cast(d) * (
        F.lit(int(window)).cast(d) * F.col("__q")
        - F.col("__s") * F.col("__s")
    )
    return withs.select(
        "bucket_start",
        "n",
        F.when(F.col("__w") < int(window), F.lit(None).cast("boolean"))
        .otherwise(lhs * lhs > rhs)
        .alias("flag"),
    )


def count_anomalies_oracle_sql(
    table: str = "events",
    ts_col: str = "ts",
    bucket: str = "hour",
    window: int = 24,
    k: int = 3,
) -> str:
    """DuckDB twin of :func:`count_anomalies` — HUGEINT arithmetic
    (exact within the same bounds)."""
    w = int(window)
    return f"""
SELECT bucket_start, n,
       CASE WHEN __w < {w} THEN NULL
            ELSE ({w}::HUGEINT * n - __s) * ({w}::HUGEINT * n - __s)
                 > {int(k * k)}::HUGEINT * ({w}::HUGEINT * __q - __s * __s)
       END AS flag
FROM (
  SELECT bucket_start, n,
         count(*) OVER win AS __w,
         sum(n::HUGEINT) OVER win AS __s,
         sum(n::HUGEINT * n) OVER win AS __q
  FROM (SELECT CAST(date_trunc('{bucket}', {ts_col}) AS TIMESTAMP)
                 AS bucket_start,
               CAST(count(*) AS BIGINT) AS n
        FROM {table} GROUP BY 1)
  WINDOW win AS (ORDER BY bucket_start
                 ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING)
)
"""


def transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every ordered (prev_type -> next_type) adjacency,
    the count and the row-normalized probability — the "what do users
    do after X" fact funnels presuppose and session analyses start
    from.

    Ordering within a user is (ts, *order_cols) — a TOTAL order when
    ``order_cols`` breaks ts ties (the events table's event_id does),
    so the lag pairing is deterministic and the DuckDB twin replays it
    exactly. Each user's FIRST event has no predecessor and yields no
    pair. A NULL event type cannot be a transition SOURCE (through
    the lag it is indistinguishable from sequence start, so those
    pairs drop with the starts — both engines identically); it still
    appears as a ``next_type`` state. p = n_transitions / n_from is
    ONE IEEE division of exact integers.

    Plan: one user-keyed window (the lag) + one (prev, next) groupBy +
    a broadcast-joined per-prev total — transition cells are
    state-cardinality², metadata for real event taxonomies. Returns
    (prev_type, next_type, n_transitions, n_from, p)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in order_cols]
    )
    pairs = (
        df.withColumn("_prev", F.lag(type_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .select(
            F.col("_prev").alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )
    totals = pairs.groupBy("prev_type").agg(
        F.sum("n_transitions").cast("bigint").alias("n_from")
    )
    return pairs.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        "n_transitions",
        "n_from",
        F.expr(
            "CAST(n_transitions AS DOUBLE) / CAST(n_from AS DOUBLE)"
        ).alias("p"),
    )


def transition_matrix_oracle_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_cols: Sequence[str] = ("event_id",),
) -> str:
    """DuckDB replay of :func:`transition_matrix`."""
    order = ", ".join([ts_col, *order_cols])
    return f"""
WITH pairs AS (
  SELECT prev_type, {type_col} AS next_type,
         CAST(count(*) AS BIGINT) AS n_transitions
  FROM (
    SELECT {type_col},
           lag({type_col}) OVER (
             PARTITION BY {user_col} ORDER BY {order}
           ) AS prev_type
    FROM {table}
  )
  WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
totals AS (
  SELECT prev_type, CAST(sum(n_transitions) AS BIGINT) AS n_from
  FROM pairs GROUP BY 1
)
SELECT p.prev_type, p.next_type, p.n_transitions, t.n_from,
       CAST(p.n_transitions AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
FROM pairs p JOIN totals t USING (prev_type)
"""
