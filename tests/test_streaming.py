"""Structured Streaming recipes: streaming results must equal batch."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import uuid

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from quality_spark.model import Id, Rule, RuleSet, RuleSuite, PASSED_INT
from quality_spark.operators.runner import add_data_quality
from quality_spark.streaming.recipes import (
    add_stream_data_quality,
    for_each_batch_dq,
    streaming_dedup_exact,
    streaming_first_seen,
    windowed_rule_stats,
)


SUITE = RuleSuite(
    Id(1, 1),
    (
        RuleSet(
            Id(10, 1),
            (
                Rule(Id(100, 1), "value >= 0"),
                Rule(Id(101, 1), "event_type is not null"),
                Rule(Id(102, 1), "user_id % 2 = 0"),
            ),
        ),
    ),
)


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir):
    """File-source streams need a directory; stage the events parquet.

    The generated events table stores TIMESTAMP(NANOS), which Spark's
    parquet reader rejects ([PARQUET_TYPE_ILLEGAL]) — stage through
    read_parquet_compat which converts to microsecond timestamps."""
    from quality_spark.sources.parquet_compat import read_parquet_compat

    d = tempfile.mkdtemp(prefix="qs_stream_")
    read_parquet_compat(spark, f"{sf_dir}/events.parquet").coalesce(2).write.mode(
        "overwrite"
    ).parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_dq_equals_batch(spark, events_stream_dir):
    batch = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(events_stream_dir)

    name = f"dq_{uuid.uuid4().hex[:8]}"
    out = add_stream_data_quality(stream, SUITE, "DQ").select(
        "event_id", F.col("DQ.overallResult").alias("overall")
    )
    _run_stream(out, name)
    got = {
        (r["event_id"], r["overall"]) for r in spark.sql(f"select * from {name}").collect()
    }
    want = {
        (r["event_id"], r["overall"])
        for r in add_data_quality(batch, SUITE, "DQ")
        .select("event_id", F.col("DQ.overallResult").alias("overall"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_windowed_rule_stats_equals_batch(spark, events_stream_dir):
    batch = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(events_stream_dir)

    name = f"win_{uuid.uuid4().hex[:8]}"
    out = windowed_rule_stats(stream, SUITE, "ts", "1 hour", "0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"]["start"], r["rows"], r["passed"], r["failed"])
        for r in spark.sql(f"select * from {name}").collect()
    }

    dq = add_data_quality(batch, SUITE, "DQ")
    overall = F.col("DQ.overallResult")
    want = {
        (r["window"]["start"], r["rows"], r["passed"], r["failed"])
        for r in dq.groupBy(F.window("ts", "1 hour").alias("window"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.when(overall == PASSED_INT, 1).otherwise(0)).alias("passed"),
            F.sum(F.when(overall == 0, 1).otherwise(0)).alias("failed"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_dedup_exact(spark, events_stream_dir):
    batch = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(events_stream_dir)

    name = f"dd_{uuid.uuid4().hex[:8]}"
    out = streaming_dedup_exact(stream, ["user_id"], "ts", "10 minutes")
    _run_stream(out.select("user_id"), name)
    got = [r["user_id"] for r in spark.sql(f"select user_id from {name}").collect()]
    # within one availableNow pass every user appears exactly once
    assert len(got) == len(set(got)) > 0
    assert set(got) == {r["user_id"] for r in batch.select("user_id").distinct().collect()}


def test_streaming_first_seen(spark, events_stream_dir):
    batch = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(events_stream_dir)

    name = f"fs_{uuid.uuid4().hex[:8]}"
    out = streaming_first_seen(stream.select("event_id", "user_id"), "user_id")
    _run_stream(out, name)
    rows = spark.sql(f"select * from {name}").collect()
    users = [r["user_id"] for r in rows]
    assert len(users) == len(set(users)) > 0
    assert set(users) == {r["user_id"] for r in batch.select("user_id").distinct().collect()}


def test_for_each_batch_dq(spark, events_stream_dir):
    batch = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(events_stream_dir)

    captured = []

    def sink(df, epoch_id):
        captured.append(df.agg(F.sum(F.when(F.col("DQ.overallResult") == PASSED_INT, 1).otherwise(0))).collect()[0][0])

    q = stream.writeStream.foreachBatch(for_each_batch_dq(SUITE, sink)).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    want = (
        add_data_quality(batch, SUITE, "DQ")
        .agg(F.sum(F.when(F.col("DQ.overallResult") == PASSED_INT, 1).otherwise(0)))
        .collect()[0][0]
    )
    assert sum(x or 0 for x in captured) == want > 0


def test_stream_rule_engine_equals_batch(spark, events_stream_dir):
    """Engine + folder runners are per-row too — identical in streams."""
    from quality_spark.model import (
        ExpressionRule,
        Id,
        OutputExpression,
        Rule,
        RuleSet,
        RuleSuite,
        RunOnPassProcessor,
    )
    from quality_spark.operators.engine import add_rule_engine

    def eng_rule(rid, salience, trigger, out):
        return Rule(
            Id(rid, 1),
            ExpressionRule(trigger),
            RunOnPassProcessor(salience, Id(rid + 1000, 1), OutputExpression(out)),
        )

    suite = RuleSuite(
        Id(2, 1),
        (
            RuleSet(
                Id(20, 1),
                (
                    eng_rule(210, 5, "value > 100", "'big'"),
                    eng_rule(211, 10, "value > 0", "'small'"),
                    eng_rule(212, 50, "true", "'fallback'"),
                ),
            ),
        ),
    )
    batch = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(events_stream_dir)

    name = f"eng_{uuid.uuid4().hex[:8]}"
    out = add_rule_engine(stream, suite, "string").select(
        "event_id", F.col("ruleEngine.result").alias("res")
    )
    _run_stream(out, name)
    got = {
        (r["event_id"], r["res"]) for r in spark.sql(f"select * from {name}").collect()
    }
    want = {
        (r["event_id"], r["res"])
        for r in add_rule_engine(batch, suite, "string")
        .select("event_id", F.col("ruleEngine.result").alias("res"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_sessionize_equals_batch(spark, events_stream_dir):
    """session_window works unchanged in Structured Streaming — the
    sessionize operator's claim. Complete mode (no watermark) so every
    session is emitted and comparable to batch."""
    from quality_spark.operators.temporal import sessionize

    batch = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(events_stream_dir)
    out = sessionize(stream, gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("sess_stream").collect()
    }
    exp = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(batch, gap="30 minutes").collect()
    }
    assert got == exp


def test_dedup_against_store_across_restarts(spark, events_stream_dir, tmp_path):
    """Durable ingest dedup: keys seen by a FIRST streaming run are
    still dropped by a SECOND, independent run (state in parquet, not
    the state store)."""
    import uuid as _uuid

    from quality_spark.streaming.recipes import dedup_against_store

    store = str(tmp_path / "seen")
    got_batches = []

    def sink(df, epoch_id):
        got_batches.append(df.count())

    handler = dedup_against_store(store, ["user_id"], sink)

    batch = spark.read.parquet(events_stream_dir)
    n_users = batch.select("user_id").distinct().count()

    def run_once():
        stream = spark.readStream.schema(batch.schema).parquet(events_stream_dir)
        q = (
            stream.writeStream.foreachBatch(handler)
            .option("checkpointLocation", str(tmp_path / f"ck_{_uuid.uuid4().hex[:6]}"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run_once()
    first_total = sum(got_batches)
    assert first_total == n_users  # within-run dedup to one row per user

    got_batches.clear()
    run_once()  # same files, fresh checkpoint -> all keys already seen
    assert sum(got_batches) == 0


def test_dedup_against_store_exact_mode_uses_real_keys(spark, tmp_path):
    """hash_only=False must dedup (in-batch AND against the store) on
    the REAL key columns — the store holds keys, not hashes, so a
    64-bit collision can never drop a distinct row."""
    from quality_spark.streaming.recipes import dedup_against_store

    store = str(tmp_path / "seen_exact")
    emitted = []

    def sink(df, epoch_id):
        emitted.extend(r["k"] for r in df.collect())

    handler = dedup_against_store(store, ["k"], sink, hash_only=False)
    b1 = spark.createDataFrame([("a", 1), ("b", 2), ("a", 3)], "k string, v int")
    handler(b1, 0)
    assert sorted(emitted) == ["a", "b"]  # in-batch dup collapsed
    stored = spark.read.parquet(store)
    assert stored.columns == ["k"]  # real key columns, no hash
    assert sorted(r["k"] for r in stored.collect()) == ["a", "b"]
    emitted.clear()
    b2 = spark.createDataFrame([("b", 4), ("c", 5)], "k string, v int")
    handler(b2, 1)
    assert emitted == ["c"]  # store anti-join on the key itself


def test_dedup_against_store_exact_mode_null_keys(spark, tmp_path):
    """Exact mode must treat a stored NULL key as seen: without the
    null-safe anti-join a NULL-key row is re-emitted and re-appended
    on every later batch (code-review regression)."""
    from quality_spark.streaming.recipes import dedup_against_store

    store = str(tmp_path / "store")
    delivered = []

    def sink(df, epoch):
        delivered.append({(r["k"], r["v"]) for r in df.collect()})

    handle = dedup_against_store(store, ["k"], sink, hash_only=False)
    b1 = spark.createDataFrame([(None, 1), (7, 2)], "k int, v int")
    handle(b1, 0)
    b2 = spark.createDataFrame([(None, 3), (8, 4)], "k int, v int")
    handle(b2, 1)
    assert delivered[0] == {(None, 1), (7, 2)}
    assert delivered[1] == {(8, 4)}  # NULL key already seen -> dropped
    # and the store holds exactly one NULL key row, not one per batch
    stored = spark.read.parquet(store).collect()
    assert sum(1 for r in stored if r["k"] is None) == 1


def test_dedup_against_bucketed_store_no_store_exchange(spark):
    """The bucketed key store (round 6 — the scale path
    dedup_against_store's docstring promised): cross-batch dedup works,
    the anti-join plan reads the store WITHOUT an Exchange (only the
    micro-batch side shuffles into the bucket layout), and
    compact_key_store folds the per-batch bucket files to one per
    bucket while preserving the key set."""
    from quality_spark.streaming.recipes import (
        compact_key_store,
        dedup_against_bucketed_store,
    )

    import shutil

    table = "qs_test_dedup_bstore"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}__compacting")
    # a crashed prior run can leave the managed location on disk while
    # the (in-memory) catalog forgot the table — clear both
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    for suffix in ("", "__compacting"):
        shutil.rmtree(f"{wh}/{table}{suffix}", ignore_errors=True)
    emitted = []

    def sink(df, epoch):
        emitted.append(sorted(r["k"] for r in df.collect()))

    handler = dedup_against_bucketed_store(table, ["k"], sink, buckets=4)
    b1 = spark.createDataFrame([("a", 1), ("b", 2), ("a", 3)], "k string, v int")
    handler(b1, 0)
    assert emitted[-1] == ["a", "b"]  # within-batch dedup too
    b2 = spark.createDataFrame([("b", 4), ("c", 5)], "k string, v int")
    handler(b2, 1)
    assert emitted[-1] == ["c"]  # cross-batch: store table consulted

    # plan pin: the REAL handler-shaped probe (within-batch dedup
    # included) anti-joins the bucketed store with exactly ONE Exchange
    # — the batch side, landed on the store's bucket partitioning.
    # Round 7: the previous pin probed a simplified plan WITHOUT the
    # dropDuplicates aggregate; in the real shape that aggregate
    # shuffled to spark.sql.shuffle.partitions, the partition counts
    # mismatched, and the planner re-shuffled the STORE side every
    # micro-batch (measured 2.7x slower at an 80M-key store) — the
    # handler now pins its batch shuffle to the bucket count.
    # Broadcast is disabled for the pin: at real scale the store side
    # is far past any broadcast threshold, and the property under test
    # is the shuffle-free SMJ probe of the store.
    from quality_spark.streaming.recipes import (
        _anti_join_seen,
        _hash_and_batch_dedup,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        seen = spark.table(table).select("__qs_key_hash")
        probe = spark.createDataFrame([("a",), ("z",)], "k string")
        hashed = _hash_and_batch_dedup(
            probe, ["k"], "__qs_key_hash", True, num_partitions=4
        )
        plan = (
            _anti_join_seen(hashed, seen, ["__qs_key_hash"], True)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert plan.count("Exchange") == 1, plan
    assert "Bucketed: true" in plan, plan

    # compaction: one file per bucket, key set preserved
    compact_key_store(spark, table)
    stored = spark.table(table)
    assert stored.count() == 3  # a, b, c hashes
    files = [
        f for f in __import__("os").listdir(
            stored.inputFiles()[0].rsplit("/", 1)[0].replace("file:", "")
        )
        if f.endswith(".parquet")
    ]
    assert len(files) == 4 or len(files) <= 4  # <= one file per bucket
    # still works as a store after compaction
    b3 = spark.createDataFrame([("c", 6), ("d", 7)], "k string, v int")
    handler(b3, 2)
    assert emitted[-1] == ["d"]
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compact_key_store_external_path(spark, tmp_path):
    """compact_key_store on an EXTERNAL store must preserve the
    caller's location (the path is the durability contract) while
    folding files and dropping replay duplicates."""
    from quality_spark.streaming.recipes import (
        compact_key_store,
        dedup_against_bucketed_store,
    )

    table = "qs_test_dedup_bstore_ext"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}__compacting")
    loc = str(tmp_path / "store")

    handler = dedup_against_bucketed_store(
        table, ["k"], lambda df, e: df.count(), buckets=2, path=loc
    )
    handler(spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"), 0)
    handler(spark.createDataFrame([("b", 3), ("c", 4)], "k string, v int"), 1)
    # simulate an at-least-once replay duplicate directly in the store
    spark.table(table).limit(1).write.mode("append").format("parquet").bucketBy(
        2, "__qs_key_hash"
    ).sortBy("__qs_key_hash").saveAsTable(table)
    assert spark.table(table).count() == 4

    compact_key_store(spark, table)
    assert spark.table(table).count() == 3  # replay dup folded
    import os

    files = spark.table(table).inputFiles()
    assert all(loc in f for f in files), files  # same external location
    assert len(files) <= 2  # one file per bucket
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compact_key_store_crash_recovery(spark, tmp_path):
    """Simulated compaction-crash windows (VERDICT r06 what's-wrong
    #3): the staged swap keeps a complete copy on disk at every
    instant, and recover_key_store — run automatically at the start of
    every compaction — finishes or cleans up an interrupted swap."""
    import os
    import shutil

    from quality_spark.streaming.recipes import (
        compact_key_store,
        dedup_against_bucketed_store,
        recover_key_store,
    )

    table = "qs_test_bstore_crash"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}__compacting")
    loc = str(tmp_path / "store")
    handler = dedup_against_bucketed_store(
        table, ["k"], lambda df, e: df.count(), buckets=2, path=loc
    )
    handler(spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"), 0)
    handler(spark.createDataFrame([("c", 3)], "k string, v int"), 1)

    def keyset():
        return sorted(r["__qs_key_hash"] for r in spark.table(table).collect())

    keys = keyset()
    assert len(keys) == 3
    stage_loc = loc.rstrip("/") + "__compacting_stage"
    old_loc = loc.rstrip("/") + "__compacting_old"

    # window 1: crash BETWEEN the two swap renames — the store dir was
    # renamed aside, the marked stage holds the complete compacted copy
    shutil.copytree(loc, stage_loc)
    open(os.path.join(stage_loc, "_QS_STAGE_COMPLETE"), "w").close()
    shutil.move(loc, old_loc)
    assert not os.path.exists(loc)
    assert recover_key_store(spark, table)  # completes the swap
    assert keyset() == keys
    assert not os.path.exists(stage_loc) and not os.path.exists(old_loc)
    assert not os.path.exists(os.path.join(loc, "_QS_STAGE_COMPLETE"))

    # window 1b (copy+delete rename FS, e.g. S3A): crash mid
    # rename(loc -> old_loc) — loc holds a PARTIAL remnant, old_loc a
    # partial copy, the marked stage is complete; recovery must prefer
    # the stage and must NOT treat the remnant as authoritative
    shutil.copytree(loc, stage_loc)
    open(os.path.join(stage_loc, "_QS_STAGE_COMPLETE"), "w").close()
    os.makedirs(old_loc)
    moved = sorted(os.listdir(loc))[0]
    shutil.move(os.path.join(loc, moved), os.path.join(old_loc, moved))
    assert recover_key_store(spark, table)
    assert keyset() == keys
    assert not os.path.exists(stage_loc) and not os.path.exists(old_loc)

    # window 1c: UNMARKED stage (partially renamed away — its marker
    # left with it) + store missing + old present: the pre-swap store
    # under old is the complete copy and must be restored; the stage
    # must not win
    shutil.copytree(loc, stage_loc)
    os.remove(
        os.path.join(stage_loc, sorted(os.listdir(stage_loc))[0])
    )  # stage is partial
    shutil.move(loc, old_loc)
    assert recover_key_store(spark, table)
    assert keyset() == keys
    assert not os.path.exists(stage_loc) and not os.path.exists(old_loc)

    # window 2: crash BEFORE the swap began — a (possibly partial)
    # stage dir exists, the store is authoritative; stage is discarded
    os.makedirs(stage_loc)
    with open(os.path.join(stage_loc, "partial.parquet"), "w") as fh:
        fh.write("junk")
    assert recover_key_store(spark, table)
    assert not os.path.exists(stage_loc)
    assert keyset() == keys

    # window 2b: MARKED stage + store present + no old dir — crash
    # after staging, before the first rename; the store is
    # authoritative (identical content), stage is discarded
    os.makedirs(stage_loc)
    open(os.path.join(stage_loc, "_QS_STAGE_COMPLETE"), "w").close()
    assert recover_key_store(spark, table)
    assert not os.path.exists(stage_loc)
    assert keyset() == keys

    # normal compaction still works after recoveries and is idempotent
    compact_key_store(spark, table)
    compact_key_store(spark, table)
    assert keyset() == keys
    assert len(spark.table(table).inputFiles()) <= 2

    # managed window: crash between DROP and RENAME — the complete
    # compacted tmp table exists, the store name is gone
    mtable = "qs_test_bstore_crash_managed"
    spark.sql(f"DROP TABLE IF EXISTS {mtable}")
    spark.sql(f"DROP TABLE IF EXISTS {mtable}__compacting")
    h2 = dedup_against_bucketed_store(
        mtable, ["k"], lambda df, e: df.count(), buckets=2
    )
    h2(spark.createDataFrame([("x", 1), ("y", 2)], "k string, v int"), 0)
    mkeys = sorted(
        r["__qs_key_hash"] for r in spark.table(mtable).collect()
    )
    (
        spark.table(mtable)
        .dropDuplicates()
        .write.format("parquet")
        .bucketBy(2, "__qs_key_hash")
        .sortBy("__qs_key_hash")
        .saveAsTable(mtable + "__compacting")
    )
    spark.sql(f"DROP TABLE {mtable}")
    assert recover_key_store(spark, mtable)
    assert spark.catalog.tableExists(mtable)
    assert sorted(
        r["__qs_key_hash"] for r in spark.table(mtable).collect()
    ) == mkeys
    # recovered table still answers probes
    h2(spark.createDataFrame([("x", 9), ("z", 10)], "k string, v int"), 1)
    assert spark.table(mtable).count() == 3
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {mtable}")


def test_sessionized_stream_stats_gap_semantics(spark):
    """session_window boundary pin: an event exactly `gap` after the
    previous one still MERGES (Spark's session end is inclusive — the
    oracle's gaps-and-islands break must be strictly >); only a gap
    exceeding `gap` starts a new session; session_end = last + gap."""
    import datetime as dt

    from quality_spark.streaming.recipes import sessionized_stream_stats

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        (1, ts(0)), (1, ts(10)), (1, ts(39)),   # merges: 10->39 is 29m < 30m
        (1, ts(69)),                            # exactly 30m later -> MERGES
        (1, ts(100)),                           # 31m later -> NEW session
        (2, ts(0)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionized_stream_stats(
            df, ["user_id"], "ts", gap="30 minutes"
        ).collect()
    )
    assert out == [
        (1, ts(0), ts(99), 4),        # 69m event merged (inclusive end)
        (1, ts(100), ts(130), 1),     # >gap starts a new session
        (2, ts(0), ts(30), 1),
    ]


def test_compact_key_store_two_sentinel_protocol(spark, tmp_path):
    """ADVICE r08 (medium): the single in-stage marker could not
    distinguish a crash mid rename(stage->loc) from one mid
    rename(loc->old) — identical observable states with OPPOSITE
    correct answers, so recovery could destroy the only complete copy.
    The round-9 protocol uses two sibling sentinel FILES
    (__stage_ready: stage complete+untouched, deleted before
    rename(stage->loc) starts; __old_complete: old is the complete
    pre-swap copy, deleted before old is removed). Every window below
    simulates a copy+delete-rename crash state and recovery must end
    with the full keyset and no leftovers."""
    import os
    import shutil

    from quality_spark.streaming.recipes import (
        compact_key_store,
        dedup_against_bucketed_store,
        recover_key_store,
    )

    table = "qs_test_bstore_sent"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}__compacting")
    loc = str(tmp_path / "store")
    handler = dedup_against_bucketed_store(
        table, ["k"], lambda df, e: df.count(), buckets=2, path=loc
    )
    handler(spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"), 0)
    handler(spark.createDataFrame([("c", 3)], "k string, v int"), 1)

    def keyset():
        return sorted(r["__qs_key_hash"] for r in spark.table(table).collect())

    keys = keyset()
    assert len(keys) == 3
    stage_loc = loc + "__compacting_stage"
    old_loc = loc + "__compacting_old"
    ready = loc + "__stage_ready"
    oldok = loc + "__old_complete"

    def parts(d):
        return [f for f in os.listdir(d) if f.startswith("part-")]

    def clean():
        assert not os.path.exists(stage_loc)
        assert not os.path.exists(old_loc)
        assert not os.path.exists(ready)
        assert not os.path.exists(oldok)

    # w1: crash after __stage_ready, before rename(loc->old) began:
    # stage complete, store intact -> swap completes from the stage
    shutil.copytree(loc, stage_loc)
    open(ready, "w").close()
    assert recover_key_store(spark, table)
    assert keyset() == keys and clean() is None

    # w2: crash mid rename(loc->old) DELETE phase (copy+delete FS):
    # stage complete + __stage_ready, old complete, loc PARTIAL ->
    # the stage is authoritative, partial remnants discarded
    shutil.copytree(loc, stage_loc)
    open(ready, "w").close()
    shutil.copytree(loc, old_loc)
    os.remove(os.path.join(loc, parts(loc)[0]))
    assert recover_key_store(spark, table)
    assert keyset() == keys and clean() is None

    # w3: crash between __old_complete creation and __stage_ready
    # deletion: both sentinels, store renamed away -> stage wins
    shutil.copytree(loc, stage_loc)
    open(ready, "w").close()
    shutil.move(loc, old_loc)
    open(oldok, "w").close()
    assert recover_key_store(spark, table)
    assert keyset() == keys and clean() is None

    # w4 — THE round-8 killer: crash mid rename(stage->loc)
    # (__stage_ready already deleted): stage PARTIAL, loc PARTIAL,
    # old is the ONLY complete copy -> old must be restored; the old
    # protocol deleted it here
    shutil.copytree(loc, old_loc)
    open(oldok, "w").close()
    shutil.copytree(loc, stage_loc)
    os.remove(os.path.join(stage_loc, parts(stage_loc)[0]))  # partial
    os.remove(os.path.join(loc, parts(loc)[0]))  # partial remnant
    assert recover_key_store(spark, table)
    assert keyset() == keys and clean() is None

    # w5: crash after rename(stage->loc) returned, before
    # __old_complete deletion: loc complete, old complete ->
    # conservative rollback to old (same keyset; compaction redoes)
    shutil.copytree(loc, old_loc)
    open(oldok, "w").close()
    assert recover_key_store(spark, table)
    assert keyset() == keys and clean() is None

    # w6: crash between __old_complete deletion and old removal:
    # no sentinels, loc + old both complete -> old is swept
    shutil.copytree(loc, old_loc)
    assert recover_key_store(spark, table)
    assert keyset() == keys and clean() is None

    # stray sentinel with no stage dir: removed, store untouched
    open(ready, "w").close()
    assert recover_key_store(spark, table)
    assert keyset() == keys and clean() is None

    # the real swap still works end-to-end (and is idempotent)
    compact_key_store(spark, table)
    compact_key_store(spark, table)
    assert keyset() == keys and clean() is None
    assert len(spark.table(table).inputFiles()) <= 2
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_profile_shards_to_store_stream(spark, sf_dir):
    """Streaming profile artifacts: a maxFilesPerTrigger=1 run lands
    one mergeable artifact per micro-batch; profile_from_shards over
    the store must equal profile_columns over the whole staged data
    BIT-FOR-BIT, and the approx store's non-sketch stats likewise."""
    from quality_spark.operators.profile import (
        profile_columns,
        profile_from_approx_shards,
        profile_from_shards,
    )
    from quality_spark.sources.parquet_compat import read_parquet_compat
    from quality_spark.streaming.recipes import profile_shards_to_store

    # stage 3 files so maxFilesPerTrigger=1 yields 3 micro-batches
    staged = tempfile.mkdtemp(prefix="qs_profsrc_")
    read_parquet_compat(spark, f"{sf_dir}/events.parquet").repartition(
        3
    ).write.mode("overwrite").parquet(staged)
    cols = ["value"]
    whole = spark.read.parquet(staged)
    want = sorted(
        tuple(r)
        for r in profile_columns(whole, cols).collect()
        if not r["stat"].startswith("hist")
    )
    schema = whole.schema
    for approx in (False, True):
        store = tempfile.mkdtemp(prefix="qs_profstore_")
        try:
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(staged)
            )
            q = (
                stream.writeStream.foreachBatch(
                    profile_shards_to_store(store, cols, approx=approx)
                )
                .option(
                    "checkpointLocation",
                    tempfile.mkdtemp(prefix="qs_profck_"),
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            import glob

            epochs = sorted(glob.glob(f"{store}/epoch=*"))
            assert len(epochs) >= 2  # one artifact per file-batch
            shards = [spark.read.parquet(p) for p in epochs]
            if approx:
                got = sorted(
                    tuple(r)
                    for r in profile_from_approx_shards(shards, cols).collect()
                    if r["stat"] != "n_distinct"
                )
                want_a = [t for t in want if t[1] != "n_distinct"]
                assert got == want_a
            else:
                got = sorted(
                    tuple(r)
                    for r in profile_from_shards(shards, cols).collect()
                    if not r["stat"].startswith("hist")
                )
                assert got == want
        finally:
            shutil.rmtree(store, ignore_errors=True)


def test_profile_store_histogram_quantiles_and_psi(spark, sf_dir):
    """Round-10 streaming monitoring loop: an approx store built with
    bins/ranges answers whole-history bounded-error quantiles
    (identical to one-shot artifacts over the same data) and
    epoch-over-epoch PSI — without rescanning any batch."""
    import glob

    from quality_spark.operators.profile import (
        profile_columns,
        profile_from_approx_shards,
        profile_psi,
        profile_shard_approx,
    )
    from quality_spark.sources.parquet_compat import read_parquet_compat
    from quality_spark.streaming.recipes import profile_shards_to_store

    staged = tempfile.mkdtemp(prefix="qs_profsrc2_")
    read_parquet_compat(spark, f"{sf_dir}/events.parquet").repartition(
        3
    ).write.mode("overwrite").parquet(staged)
    cols = ["value"]
    whole = spark.read.parquet(staged)
    ex = {
        r["stat"]: r["value"]
        for r in profile_columns(whole, cols, bins=0).collect()
    }
    ranges = {"value": (ex["min"], ex["max"])}
    store = tempfile.mkdtemp(prefix="qs_profstore2_")
    stream = (
        spark.readStream.schema(whole.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    q = (
        stream.writeStream.foreachBatch(
            profile_shards_to_store(
                store, cols, approx=True, bins=8, ranges=ranges
            )
        )
        .option("checkpointLocation", tempfile.mkdtemp(prefix="qs_pk2_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    epochs = sorted(glob.glob(f"{store}/epoch=*"))
    assert len(epochs) >= 2
    shards = [spark.read.parquet(p) for p in epochs]
    got = sorted(
        tuple(r)
        for r in profile_from_approx_shards(
            shards, cols, quantiles=(0.5,)
        ).collect()
        if r["stat"] == "p50"
    )
    want = sorted(
        tuple(r)
        for r in profile_from_approx_shards(
            [profile_shard_approx(whole, cols, bins=8, ranges=ranges)],
            cols,
            quantiles=(0.5,),
        ).collect()
        if r["stat"] == "p50"
    )
    assert got == want and len(got) == 1
    psi = {
        r["metric"]: r["value"]
        for r in profile_psi([shards[0]], shards[1:], cols).collect()
    }
    assert "psi_micro" in psi and psi["n_base"] > 0 and psi["n_cur"] > 0
    # validation: bins on an exact store is a usage error
    import pytest

    with pytest.raises(ValueError, match="approx"):
        profile_shards_to_store(store, cols, approx=False, bins=8)


def test_scd2_to_store_stream(spark, sf_dir):
    """Streaming SCD2 maintenance. The foreachBatch handler is a plain
    function, so the order-sensitive fold is driven DIRECTLY with
    deterministic epoch ids (a file-source stream does not guarantee
    arrival order matches our staging order, and SCD2 is
    order-sensitive by contract): three time-ranged batches fold into
    the versioned store and must equal the ONE-SHOT scd2_apply over
    the union; replaying a committed epoch is a no-op (exactly-once
    guard); old versions are pruned to keep_versions."""
    from quality_spark.operators.temporal import scd2_apply
    from quality_spark.sources.parquet_compat import read_parquet_compat
    from quality_spark.streaming.recipes import (
        _scd2_versions,
        read_scd2_store,
        scd2_to_store,
    )

    ev = read_parquet_compat(spark, f"{sf_dir}/events.parquet").filter(
        F.col("event_id") % 5 == 0
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 3
    batches = []
    for i in range(3):
        end = lo + (i + 1) * span
        cond = (F.col("ts") >= lo + i * span) & (
            (F.col("ts") < end) if i < 2 else F.lit(True)
        )
        batches.append(ev.filter(cond))

    store = tempfile.mkdtemp(prefix="qs_scdstore_")
    handler = scd2_to_store(
        store, ["user_id"], ["event_type", "value"],
        order_cols=["ts", "event_id"], keep_versions=2,
    )
    for i, b in enumerate(batches):
        handler(b, i)

    got = read_scd2_store(spark, store)
    assert got is not None
    ts_type = dict(ev.dtypes)["ts"]
    empty = ev.select(
        "user_id", "event_type", "value",
        F.col("ts").alias("valid_from"),
        F.lit(None).cast(ts_type).alias("valid_to"),
    ).limit(0)
    want = scd2_apply(
        empty, ev, ["user_id"], ["event_type", "value"],
        order_cols=["ts", "event_id"],
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # exactly-once: replaying a committed epoch is a no-op even with
    # different (garbage) content
    before = sorted(map(tuple, read_scd2_store(spark, store).collect()))
    handler(ev, 2)
    after = sorted(map(tuple, read_scd2_store(spark, store).collect()))
    assert before == after
    # pruning: keep_versions=2 retains exactly the last two commits
    assert _scd2_versions(spark, store) == [1, 2]
    # SCD2 invariant: one current row per key
    cur = got.filter("valid_to IS NULL").groupBy("user_id").count()
    assert cur.filter("count > 1").count() == 0
    # bootstrap-from-empty read
    assert read_scd2_store(spark, tempfile.mkdtemp()) is None


def test_corr_shards_to_store_stream(spark, sf_dir):
    """Streaming correlation artifacts: one corr_shard per
    micro-batch; corr_from_shards over the store must equal
    numeric_correlations over the whole staged data BIT-FOR-BIT."""
    from quality_spark.operators.stats import (
        corr_from_shards,
        numeric_correlations,
    )
    from quality_spark.sources.parquet_compat import read_parquet_compat
    from quality_spark.streaming.recipes import corr_shards_to_store

    staged = tempfile.mkdtemp(prefix="qs_corrsrc_")
    read_parquet_compat(spark, f"{sf_dir}/lineitem.parquet").repartition(
        3
    ).write.mode("overwrite").parquet(staged)
    cols = ["l_quantity", "l_extendedprice"]
    whole = spark.read.parquet(staged)
    want = sorted(map(tuple, numeric_correlations(whole, cols).collect()))

    store = tempfile.mkdtemp(prefix="qs_corrstore_")
    stream = (
        spark.readStream.schema(whole.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    q = (
        stream.writeStream.foreachBatch(corr_shards_to_store(store, cols))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="qs_corrck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    import glob

    epochs = sorted(glob.glob(f"{store}/epoch=*"))
    assert len(epochs) >= 2
    shards = [spark.read.parquet(p) for p in epochs]
    got = sorted(map(tuple, corr_from_shards(shards, cols).collect()))
    assert got == want


def test_neardup_to_store_stream(spark, sf_dir):
    """Round-11 streaming near-dup (VERDICT r10 next #7): three
    batches folded through neardup_to_store must elect EXACTLY the
    keepers dedup_near elects one-shot over the union — including a
    crafted RETROACTIVE merge (doc 9003 in the last batch bridges
    9001 and 9002 from different earlier batches, demoting 9002's
    keepership after the fact, the case a first-seen fold gets
    wrong). Also pins the full (id -> root) component map, the
    exactly-once replay guard, and version pruning."""
    from quality_spark.llm.dedup import (
        connected_components,
        dedup_near,
        minhash_lsh_pairs,
    )
    from quality_spark.sources.parquet_compat import read_parquet_compat
    from quality_spark.streaming.recipes import (
        _neardup_versions,
        neardup_to_store,
        read_neardup_store,
    )

    kw = dict(k=3, num_perm=16, bands=8, threshold=0.3)
    a_block = " ".join(f"alpha{i}" for i in range(12))
    b_block = " ".join(f"delta{i}" for i in range(12))
    crafted = {
        0: (9001, a_block),
        1: (9002, b_block),
        2: (9003, a_block + " " + b_block),
    }
    docs = read_parquet_compat(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).filter("doc_id < 240")
    batches = []
    for i in range(3):
        extra = spark.createDataFrame(
            [crafted[i]], "doc_id long, text string"
        )
        batches.append(docs.filter(F.col("doc_id") % 3 == i).unionByName(extra))

    store = tempfile.mkdtemp(prefix="qs_ndstore_")
    handler = neardup_to_store(store, keep_versions=2, **kw)
    for i, b in enumerate(batches):
        handler(b, i)

    union = batches[0].unionByName(batches[1]).unionByName(batches[2])
    got = read_neardup_store(spark, store)
    kept_got = sorted(r["id"] for r in got.filter("keep").collect())
    kept_want = sorted(
        r["doc_id"] for r in dedup_near(union, method="minhash", **kw).collect()
    )
    assert kept_got == kept_want and len(kept_got) > 0
    # full component map equality: root == one-shot CC component (min
    # id), singletons root = self
    comp = connected_components(
        minhash_lsh_pairs(union, **kw).select("id_a", "id_b")
    )
    want_root = {r["id"]: r["component"] for r in comp.collect()}
    for r in got.collect():
        assert r["root"] == want_root.get(r["id"], r["id"]), (
            r["id"], r["root"], want_root.get(r["id"]),
        )
    # the crafted retro-merge actually fired: 9003 bridged the two
    # earlier singletons, so all three share root 9001 and 9002 (a
    # keeper after batch 1) is demoted
    roots = {r["id"]: r["root"] for r in got.collect()}
    assert roots[9001] == roots[9002] == roots[9003] == 9001
    assert 9002 in set(roots) and 9002 not in set(kept_got)
    # exactly-once: replaying a committed epoch (garbage content) is
    # a no-op
    before = sorted(map(tuple, read_neardup_store(spark, store).collect()))
    handler(union, 2)
    after = sorted(map(tuple, read_neardup_store(spark, store).collect()))
    assert before == after
    assert _neardup_versions(spark, store) == [1, 2]


def test_neardup_store_pruned_probe_and_crash_recovery(spark, sf_dir):
    """The rebuilt (round-11b) append-only near-dup store: (1) the
    history probe is a PRUNED scan — PartitionFilters carry the
    committed-epoch IN list and the batch's band-bucket IN list,
    never a state scan; (2) a crash BEFORE the epochs/ commit table
    leaves idmap/sigs epoch dirs every reader ignores, and the
    replay overwrites them into the identical final state; (3) alias
    path-compression holds — no alias target is itself a dead root,
    so resolution is a single hop."""
    import re

    from quality_spark.llm.dedup import dedup_near
    from quality_spark.sources.parquet_compat import read_parquet_compat
    from quality_spark.streaming.recipes import (
        _neardup_committed,
        neardup_to_store,
        read_neardup_store,
    )

    kw = dict(k=3, num_perm=16, bands=8, threshold=0.3)
    docs = read_parquet_compat(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).filter("doc_id < 180")
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    store = tempfile.mkdtemp(prefix="qs_ndstore2_")
    handler = neardup_to_store(store, **kw)
    handler(batches[0], 0)
    handler(batches[1], 1)

    # (1) pruned probe: build the probe scan the handler uses and pin
    # its PartitionFilters
    eps, _ = _neardup_committed(spark, store)
    probe = (
        spark.read.option("basePath", f"{store}/sigs")
        .parquet(f"{store}/sigs")
        .filter(F.col("epoch").isin(eps) & F.col("bb").isin([0, 1, 2]))
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "epoch" in m.group(1) and "bb" in m.group(1), plan[:600]

    # (2) crash before commit: make the epochs write explode
    import unittest.mock as mock

    from pyspark.sql.readwriter import DataFrameWriter

    real_parquet = DataFrameWriter.parquet

    def boom(self, path, *a, **kw2):
        if path.endswith("/epochs"):
            raise RuntimeError("simulated crash")
        return real_parquet(self, path, *a, **kw2)

    with mock.patch.object(DataFrameWriter, "parquet", boom):
        with pytest.raises(RuntimeError, match="simulated crash"):
            handler(batches[2], 2)
    # uncommitted epoch invisible to readers
    eps_after, _ = _neardup_committed(spark, store)
    assert eps_after == [0, 1]
    visible = read_neardup_store(spark, store)
    batch2_ids = {r["doc_id"] for r in batches[2].select("doc_id").collect()}
    assert not (
        {r["id"] for r in visible.select("id").collect()} & batch2_ids
    )
    # replay overwrites the half-written epoch dirs into the real state
    handler(batches[2], 2)
    got = read_neardup_store(spark, store)
    kept_got = sorted(r["id"] for r in got.filter("keep").collect())
    union = batches[0].unionByName(batches[1]).unionByName(batches[2])
    kept_want = sorted(
        r["doc_id"] for r in dedup_near(union, method="minhash", **kw).collect()
    )
    assert kept_got == kept_want and len(kept_got) > 0

    # (3) path compression: alias targets are live (never dead roots)
    eps3, ver3 = _neardup_committed(spark, store)
    alias = spark.read.parquet(f"{store}/aliases/version={ver3}/table")
    dead = {r["dead_root"] for r in alias.collect()}
    live = {r["live_root"] for r in alias.collect()}
    assert not (dead & live), (dead, live)


def test_neardup_store_compaction(spark, sf_dir):
    """compact_neardup_store consolidates the epoch dirs into one dir
    per table with rows EXACTLY preserved, the stream continues
    correctly afterwards (equality with one-shot dedup_near over all
    batches), replay-skipping survives, a second compaction folds the
    consolidated dir too, and a crash before the compaction-log
    commit leaves the store untouched."""
    import glob
    import unittest.mock as mock

    from quality_spark.llm.dedup import dedup_near
    from quality_spark.sources.parquet_compat import read_parquet_compat
    from quality_spark.streaming.recipes import (
        _neardup_committed,
        _neardup_live_dirs,
        compact_neardup_store,
        neardup_to_store,
        read_neardup_store,
    )

    kw = dict(k=3, num_perm=16, bands=8, threshold=0.3)
    docs = read_parquet_compat(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).filter("doc_id < 160")
    batches = [docs.filter(F.col("doc_id") % 4 == i) for i in range(4)]
    store = tempfile.mkdtemp(prefix="qs_ndstore3_")
    handler = neardup_to_store(store, **kw)
    handler(batches[0], 0)
    handler(batches[1], 1)
    before = sorted(map(tuple, read_neardup_store(spark, store).collect()))

    # crash BEFORE the compaction-log commit: consolidated dirs may be
    # orphaned but the store reads identically
    from pyspark.sql.readwriter import DataFrameWriter

    real_parquet = DataFrameWriter.parquet

    def boom(self, path, *a, **kw2):
        if "/compactions/" in path:
            raise RuntimeError("simulated crash")
        return real_parquet(self, path, *a, **kw2)

    with mock.patch.object(DataFrameWriter, "parquet", boom):
        with pytest.raises(RuntimeError, match="simulated crash"):
            compact_neardup_store(spark, store)
    assert sorted(map(tuple, read_neardup_store(spark, store).collect())) == before

    # real compaction: rows identical, one live dir per table
    compact_neardup_store(spark, store)
    assert sorted(map(tuple, read_neardup_store(spark, store).collect())) == before
    eps, _ = _neardup_committed(spark, store)
    dirs = _neardup_live_dirs(spark, store, eps)
    assert len(dirs) == 1 and dirs[0] < 0
    assert len(glob.glob(f"{store}/idmap/epoch=*")) == 1

    # the stream continues against the compacted store
    handler(batches[2], 2)
    handler(batches[3], 3)
    got = read_neardup_store(spark, store)
    kept_got = sorted(r["id"] for r in got.filter("keep").collect())
    union = batches[0]
    for b in batches[1:]:
        union = union.unionByName(b)
    kept_want = sorted(
        r["doc_id"] for r in dedup_near(union, method="minhash", **kw).collect()
    )
    assert kept_got == kept_want and len(kept_got) > 0
    # replay of a committed epoch is still a no-op after compaction
    snap = sorted(map(tuple, read_neardup_store(spark, store).collect()))
    handler(union, 1)
    assert sorted(map(tuple, read_neardup_store(spark, store).collect())) == snap
    # second compaction folds consolidated + new epoch dirs again
    compact_neardup_store(spark, store)
    assert sorted(map(tuple, read_neardup_store(spark, store).collect())) == snap
    eps2, _ = _neardup_committed(spark, store)
    dirs2 = _neardup_live_dirs(spark, store, eps2)
    assert len(dirs2) == 1 and dirs2[0] < dirs[0]


def test_neardup_store_alias_carry_forward_on_quiet_batch(spark):
    """ADVICE r11 (high): a batch with NO candidate pairs against a
    non-empty store must carry the previous alias table forward —
    readers consult only the newest version, so writing an empty
    table there loses every prior merge (demoted keepers resurrect).
    Batch 0 seeds doc 5; batch 1's doc 2 merges with it (root 5 dies,
    alias 5->2); batch 2 is fully disjoint text. After batch 2 the
    keeper set must STILL equal one-shot dedup_near over the union."""
    from quality_spark.llm.dedup import dedup_near
    from quality_spark.streaming.recipes import (
        _neardup_committed,
        neardup_to_store,
        read_neardup_store,
    )

    kw = dict(k=3, num_perm=16, bands=8, threshold=0.3)
    text_b = " ".join(f"delta{i}" for i in range(12))
    text_c = " ".join(f"zeta{i}" for i in range(12))
    batches = [
        spark.createDataFrame([(5, text_b)], "doc_id long, text string"),
        spark.createDataFrame([(2, text_b)], "doc_id long, text string"),
        spark.createDataFrame([(9, text_c)], "doc_id long, text string"),
    ]
    store = tempfile.mkdtemp(prefix="qs_ndstore_quiet_")
    handler = neardup_to_store(store, **kw)
    for i, b in enumerate(batches):
        handler(b, i)

    _, ver = _neardup_committed(spark, store)
    assert ver == 2
    alias = {
        r["dead_root"]: r["live_root"]
        for r in spark.read.parquet(
            f"{store}/aliases/version={ver}/table"
        ).collect()
    }
    # the batch-1 merge alias survived the quiet batch 2
    assert alias == {5: 2}

    got = read_neardup_store(spark, store)
    roots = {r["id"]: r["root"] for r in got.collect()}
    assert roots == {5: 2, 2: 2, 9: 9}
    kept_got = sorted(r["id"] for r in got.filter("keep").collect())
    union = batches[0].unionByName(batches[1]).unionByName(batches[2])
    kept_want = sorted(
        r["doc_id"]
        for r in dedup_near(union, method="minhash", **kw).collect()
    )
    assert kept_got == kept_want == [2, 9]
    shutil.rmtree(store, ignore_errors=True)


def test_neardup_store_writer_exclusion(spark):
    """ADVICE r11 (low): the one-writer contract is asserted, not just
    documented. (1) compact_neardup_store refuses while an in-flight
    batch marker exists, and force=True overrides; (2) a batch refuses
    while the _COMPACTING sentinel is present; (3) a crashed batch's
    marker clears when its epoch replays."""
    import unittest.mock as mock

    from pyspark.sql.readwriter import DataFrameWriter

    from quality_spark.streaming.recipes import (
        compact_neardup_store,
        neardup_to_store,
        read_neardup_store,
    )

    kw = dict(k=3, num_perm=16, bands=8, threshold=0.3)
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(9)]
    b0 = spark.createDataFrame(rows[:3], "doc_id long, text string")
    b1 = spark.createDataFrame(rows[3:6], "doc_id long, text string")
    b1b = spark.createDataFrame(rows[6:9], "doc_id long, text string")
    store = tempfile.mkdtemp(prefix="qs_ndstore_excl_")
    handler = neardup_to_store(store, **kw)
    handler(b0, 0)
    handler(b1, 1)

    # (3) crash mid-batch leaves the marker...
    real_parquet = DataFrameWriter.parquet

    def boom(self, path, *a, **kw2):
        if path.endswith("/epochs"):
            raise RuntimeError("simulated crash")
        return real_parquet(self, path, *a, **kw2)

    with mock.patch.object(DataFrameWriter, "parquet", boom):
        with pytest.raises(RuntimeError, match="simulated crash"):
            handler(b1b, 2)
    assert os.path.exists(f"{store}/_inflight/epoch=2")
    # (1) ...which blocks compaction (fail-loud, store untouched)...
    with pytest.raises(RuntimeError, match="in-flight batch markers"):
        compact_neardup_store(spark, store)
    assert not os.path.exists(f"{store}/compactions/_COMPACTING")
    # ...unless forced (abandoned-checkpoint escape hatch)
    compact_neardup_store(spark, store, force=True)
    # the replay clears the marker and lands the batch
    handler(b1b, 2)
    assert not os.path.exists(f"{store}/_inflight/epoch=2")
    got = read_neardup_store(spark, store)
    assert sorted(r["id"] for r in got.collect()) == list(range(9))

    # (2) a batch refuses while the compaction sentinel is held
    os.makedirs(f"{store}/compactions", exist_ok=True)
    with open(f"{store}/compactions/_COMPACTING", "w"):
        pass
    b2 = spark.createDataFrame(
        [(99, "omega " * 12)], "doc_id long, text string"
    )
    with pytest.raises(RuntimeError, match="_COMPACTING"):
        handler(b2, 3)
    # and a stale sentinel blocks compaction with the recovery hint
    with pytest.raises(RuntimeError, match="delete the sentinel"):
        compact_neardup_store(spark, store)
    os.remove(f"{store}/compactions/_COMPACTING")
    # recovered: both writers work again
    handler(b2, 3)
    compact_neardup_store(spark, store)
    got2 = read_neardup_store(spark, store)
    assert sorted(r["id"] for r in got2.collect()) == list(range(9)) + [99]
    shutil.rmtree(store, ignore_errors=True)


def test_neardup_store_probe_broadcast_fallback(spark, sf_dir, monkeypatch):
    """VERDICT r11 #6: past _ISIN_PRUNE_MAX distinct band/id buckets
    the history probe switches from IN-literal pruning to a broadcast
    left-semi join on the bucket column — the physical plan carries no
    giant In list, and the streamed store state is IDENTICAL to the
    literal path's."""
    import re

    from quality_spark.sources.parquet_compat import read_parquet_compat
    from quality_spark.streaming import recipes
    from quality_spark.streaming.recipes import (
        _neardup_committed,
        _neardup_live_dirs,
        _pruned_store_scan,
        neardup_to_store,
        read_neardup_store,
    )

    kw = dict(k=3, num_perm=16, bands=8, threshold=0.3)
    docs = read_parquet_compat(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).filter("doc_id < 240")
    batches = [docs.filter(F.col("doc_id") % 2 == i) for i in range(2)]

    s1 = tempfile.mkdtemp(prefix="qs_nd_lit_")
    h1 = neardup_to_store(s1, **kw)
    for i, b in enumerate(batches):
        h1(b, i)
    lit_state = sorted(
        map(tuple, read_neardup_store(spark, s1).collect())
    )

    monkeypatch.setattr(recipes, "_ISIN_PRUNE_MAX", 2)
    s2 = tempfile.mkdtemp(prefix="qs_nd_semi_")
    h2 = neardup_to_store(s2, **kw)
    for i, b in enumerate(batches):
        h2(b, i)
    semi_state = sorted(
        map(tuple, read_neardup_store(spark, s2).collect())
    )
    assert lit_state == semi_state and len(lit_state) > 0

    # plan pin: the fallback probe is a semi join with NO In-literal
    # list on the bucket column
    eps, _ = _neardup_committed(spark, s2)
    dirs = _neardup_live_dirs(spark, s2, eps)
    buckets = spark.range(0, 40).select(F.col("id").alias("bb"))
    probe = _pruned_store_scan(spark, f"{s2}/sigs", dirs, "bb", buckets)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"bb#\d+ IN \(", plan), plan[:800]
    assert "LeftSemi" in plan, plan[:800]
    # and the literal path (small set) still prunes statically
    monkeypatch.setattr(recipes, "_ISIN_PRUNE_MAX", 128)
    small = spark.range(0, 3).select(F.col("id").alias("bb"))
    probe2 = _pruned_store_scan(spark, f"{s2}/sigs", dirs, "bb", small)
    plan2 = probe2._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan2)
    assert m and "bb" in m.group(1), plan2[:800]
    shutil.rmtree(s1, ignore_errors=True)
    shutil.rmtree(s2, ignore_errors=True)


def test_neardup_store_stale_marker_clears_on_replay(spark):
    """Review r12: a crash BETWEEN the epoch commit and the in-flight
    marker delete leaves a committed epoch with a stale marker. The
    replay of that epoch (the normal streaming restart) must clear the
    marker — otherwise compaction is blocked forever on a store that
    has no in-flight work."""
    from quality_spark.streaming.recipes import (
        compact_neardup_store,
        neardup_to_store,
        read_neardup_store,
    )

    kw = dict(k=3, num_perm=16, bands=8, threshold=0.3)
    rows = [(i, " ".join(f"m{i}_{j}" for j in range(12))) for i in range(6)]
    b0 = spark.createDataFrame(rows[:3], "doc_id long, text string")
    b1 = spark.createDataFrame(rows[3:], "doc_id long, text string")
    store = tempfile.mkdtemp(prefix="qs_ndstore_stale_")
    handler = neardup_to_store(store, **kw)
    handler(b0, 0)
    handler(b1, 1)
    # simulate the crash window: epoch 1 is committed but its marker
    # survived
    os.makedirs(f"{store}/_inflight", exist_ok=True)
    with open(f"{store}/_inflight/epoch=1", "w"):
        pass
    with pytest.raises(RuntimeError, match="in-flight batch markers"):
        compact_neardup_store(spark, store)
    # the restart replays the committed epoch: no-op for data, but the
    # stale marker clears
    before = sorted(map(tuple, read_neardup_store(spark, store).collect()))
    handler(b1, 1)
    assert not os.path.exists(f"{store}/_inflight/epoch=1")
    assert sorted(map(tuple, read_neardup_store(spark, store).collect())) == before
    compact_neardup_store(spark, store)  # now unblocked
    assert sorted(map(tuple, read_neardup_store(spark, store).collect())) == before
    shutil.rmtree(store, ignore_errors=True)
