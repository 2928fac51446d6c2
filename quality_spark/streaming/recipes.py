"""Structured Streaming recipes for the engine's operators.

The reference's runners are stateless per-row expressions, so they work
in ``readStream`` selects untouched (reference: README.md:3 "batch or
streaming"; nondeterminism caveats impl/id/GuaranteedUniqueIdExpression.scala:17-18).
What the reference leaves to the user — watermarks, windowed
aggregation of DQ results, streaming dedup — is packaged here as
explicit recipes on top of Structured Streaming.

Scale notes: every recipe keeps state bounded — watermarks expire
window/dedup state, and the stateful first-seen dedup keys state by the
dedup key only (no payload retained). All per-row work is JVM-side
Columns; Python appears only in ``applyInPandasWithState`` where Spark
has no built-in operator.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import RuleSuite
from ..operators.runner import add_data_quality


def _watermarkable(df: DataFrame, event_time: str) -> DataFrame:
    """Spark rejects TIMESTAMP_NTZ event-time columns for watermarks
    ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]); parquet written with
    isAdjustedToUTC=false (e.g. pyarrow timestamp[us]) reads back as
    NTZ.  Reinterpret as session-timezone TIMESTAMP — wall-clock
    VALUES are preserved.  Window ALIGNMENT caveat: F.window on
    TIMESTAMP aligns to UTC epoch instants, so in a session timezone
    with a fractional-hour UTC offset (e.g. +05:30) hour-window
    boundaries land on :30 wall-clock, unlike windows taken directly
    on the NTZ column.  Run streaming window recipes in a whole-hour
    -offset session timezone (UTC recommended — our sessions pin it)
    when comparing against NTZ batch twins."""
    field = df.schema[event_time]
    if isinstance(field.dataType, T.TimestampNTZType):
        return df.withColumn(event_time, F.col(event_time).cast("timestamp"))
    return df


def add_stream_data_quality(df: DataFrame, suite: RuleSuite, name: str = "DataQuality") -> DataFrame:
    """DQ over a streaming DataFrame — identical column tree as batch;
    provided as an explicit alias so intent shows up in user code."""
    return add_data_quality(df, suite, name)


def windowed_rule_stats(
    df: DataFrame,
    suite: RuleSuite,
    event_time: str,
    window_duration: str,
    watermark: str,
    slide: Optional[str] = None,
    dq_name: str = "DQ",
) -> DataFrame:
    """Tumbling (or sliding) per-window pass/fail counts of the overall
    DQ result — the streaming analogue of a batch
    ``groupBy().agg(agg_expr(...))`` dashboard query.  State is bounded
    by the watermark."""
    from ..model import PASSED_INT

    dq = _watermarkable(add_data_quality(df, suite, dq_name), event_time).withWatermark(
        event_time, watermark
    )
    win = (
        F.window(event_time, window_duration, slide)
        if slide
        else F.window(event_time, window_duration)
    )
    overall = F.col(f"{dq_name}.overallResult")
    return dq.groupBy(win.alias("window")).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(overall == F.lit(PASSED_INT), 1).otherwise(0)).alias("passed"),
        F.sum(F.when(overall == 0, 1).otherwise(0)).alias("failed"),
    )


def streaming_dedup_exact(
    df: DataFrame,
    keys: Sequence[str],
    event_time: str,
    watermark: str,
) -> DataFrame:
    """Exact streaming dedup with bounded state:
    ``withWatermark + dropDuplicatesWithinWatermark`` — duplicates
    arriving within the watermark horizon are dropped; state expires
    with the watermark (Spark's built-in streaming dedup operator)."""
    out = _watermarkable(df, event_time).withWatermark(event_time, watermark)
    try:
        return out.dropDuplicatesWithinWatermark(list(keys))
    except AttributeError:  # Spark < 3.5
        return out.dropDuplicates(list(keys) + [event_time])


_FIRST_SEEN_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def streaming_first_seen(
    df: DataFrame,
    key: str,
    timeout_ms: Optional[int] = None,
) -> DataFrame:
    """Custom stateful operator: emit only the FIRST row per key ever
    seen (unbounded horizon — unlike dropDuplicatesWithinWatermark the
    key memory never expires unless a timeout is given).  Implemented
    with ``applyInPandasWithState`` since Spark has no built-in
    unbounded-horizon streaming dedup that emits rows.

    State per key is one boolean — ~16 bytes/key plus key bytes; at
    100 TB-scale key cardinality prefer :func:`streaming_dedup_exact`
    with a realistic watermark, or pre-shard by key ranges.

    Precision caveat (pandas state API limitation): the emitted first
    row round-trips through pandas, where a NULLABLE bigint payload
    column whose batch contains a null is represented as float64 —
    payload values above 2^53 in such a column can round in the
    emitted row (key columns are unaffected: each group's batch holds
    only the key's own non-null values). Cast identity-bearing
    nullable bigint payloads to string upstream if they can exceed
    2^53.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = df.schema
    timeout = (
        GroupStateTimeout.NoTimeout if timeout_ms is None else GroupStateTimeout.ProcessingTimeTimeout
    )

    def fn(key_tuple, pdf_iter, state):
        # timeout fired: REMOVE the key's state so the memory actually
        # expires (without this the timed-out state would live forever,
        # with no timeout armed — unbounded growth despite the option)
        if state.hasTimedOut:
            state.remove()
            for _ in pdf_iter:
                pass
            return
        if state.exists:
            # already emitted for this key; consume, emit nothing, and
            # RE-ARM the timeout — a live key's memory should expire
            # relative to its last sighting, not its first
            for _ in pdf_iter:
                pass
            if timeout_ms is not None:
                state.setTimeoutDuration(int(timeout_ms))
            return
        first = None
        for pdf in pdf_iter:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]]
        state.update((True,))
        if timeout_ms is not None:
            state.setTimeoutDuration(int(timeout_ms))
        if first is not None:
            yield first

    return (
        df.groupBy(key)
        .applyInPandasWithState(fn, schema, _FIRST_SEEN_STATE, "append", timeout)
    )


def for_each_batch_dq(
    suite: RuleSuite,
    sink,
    dq_name: str = "DQ",
):
    """``foreachBatch`` adapter: run the full batch DQ surface
    (including aggregates/blooms that streaming can't express) on each
    micro-batch and hand the result to ``sink(df, epoch_id)``."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        sink(add_data_quality(batch_df, suite, dq_name), epoch_id)

    return handle


def profile_shards_to_store(
    store_path: str,
    cols: Sequence[str],
    approx: bool = False,
    bins: int = 0,
    ranges: dict = None,
):
    """``foreachBatch`` handler: land a MERGEABLE profile artifact per
    micro-batch (``operators.profile.profile_shard`` — or the
    KB-sized HLL ``profile_shard_approx`` with ``approx=True``) under
    ``store_path/epoch=<id>``. The profile of everything ingested so
    far is then ``profile_from_shards([read store_path])`` (or the
    approx twin) WITHOUT rescanning any batch, and day-over-day drift
    is ``profile_drift`` over two epoch ranges — streaming DQ
    monitoring whose per-batch cost is one aggregate.

    ``approx=True, bins=B, ranges={col: (lo_mic, hi_mic)}`` (round
    10) additionally packs the fixed-bin histogram into every epoch's
    artifact, so the stored history answers bounded-error quantiles
    (``profile_from_approx_shards(quantiles=…)``) AND epoch-over-epoch
    distributional significance (``profile_psi``) — the full
    monitoring loop over a stream, still one aggregate per batch.

    Partitioning by epoch keeps artifacts append-only (no
    read-modify-write, crash-safe: a re-run of an epoch overwrites
    only its own partition via dynamic overwrite semantics — we write
    with mode=overwrite on the epoch subdir)."""
    from ..operators.profile import profile_shard, profile_shard_approx

    if bins and not approx:
        raise ValueError("bins/ranges require approx=True artifacts")

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        art = (
            profile_shard_approx(
                batch_df, list(cols), bins=bins, ranges=ranges
            )
            if approx
            else profile_shard(batch_df, list(cols))
        )
        art.write.mode("overwrite").parquet(
            f"{store_path}/epoch={int(epoch_id)}"
        )

    return handle


def dedup_against_store(
    store_path: str,
    keys: Sequence[str],
    sink,
    key_hash_col: str = "__qs_key_hash",
    hash_only: bool = True,
):
    """``foreachBatch`` handler for INCREMENTAL ingest dedup: each
    micro-batch drops rows whose key was seen in ANY earlier batch
    (cross-restart durable — the seen-key set lives as parquet at
    ``store_path``), then appends the survivors' keys to the store and
    hands the survivor rows to ``sink(df, epoch_id)``.

    This is the streaming complement to dropDuplicatesWithinWatermark:
    unbounded horizon like :func:`streaming_first_seen`, but state
    lives on (shared) storage instead of the state store, so it
    survives restarts, scales past executor memory, and the per-batch
    cost is one keyed join against the store. Keys are stored as
    xxhash64 of the concatenated key columns — 8 bytes/key regardless
    of key width. At 100 TB-ingest scale use
    :func:`dedup_against_bucketed_store` (+ :func:`compact_key_store`):
    the bucketed table probe reads the store pre-partitioned, so only
    the micro-batch shuffles.

    Within-batch duplicates also collapse (keep-first by the same join
    key the store uses: hash in hash_only mode, the REAL key columns in
    exact mode — so exact mode is collision-proof within a batch too).

    Delivery semantics: the SINK runs before the key append, so a
    failure between the two replays the batch with its keys still
    absent — AT-LEAST-ONCE delivery (duplicates possible on crash),
    never silent loss. (Appending keys first would invert that: a
    replayed batch finds its keys already stored and drops every row.)

    ``hash_only=True`` stores 8-byte xxhash64 keys — tiny store, but a
    64-bit collision silently drops a distinct row (birthday bound:
    collisions become likely around ~4B distinct keys). For key
    cardinality at that scale pass ``hash_only=False`` to store the
    actual key columns and anti-join on them exactly.
    """

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        join_cols = [key_hash_col] if hash_only else list(keys)
        hashed = _hash_and_batch_dedup(batch_df, keys, key_hash_col, hash_only)
        try:
            seen = spark.read.parquet(store_path).select(*join_cols)
            fresh = _anti_join_seen(hashed, seen, join_cols, hash_only)
        except AnalysisException:
            # ONLY the genuine first batch (store path not yet created)
            # may skip the anti-join; any other read failure must fail
            # the batch — treating an S3 hiccup as "first batch" would
            # silently disable dedup for the whole micro-batch
            fresh = hashed
        # persist: sink and store-append must see the SAME survivor set
        # even though the anti-join re-reads the store
        fresh = fresh.cache()
        try:
            sink(fresh.drop(key_hash_col), epoch_id)
            fresh.select(*join_cols).write.mode("append").parquet(store_path)
        finally:
            fresh.unpersist()

    return handle


def _hash_and_batch_dedup(
    batch_df: DataFrame,
    keys: Sequence[str],
    key_hash_col: str,
    hash_only: bool,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    # within-batch dedup on join_cols, NOT always the hash: in
    # exact mode (hash_only=False) a 64-bit in-batch collision
    # would silently drop a distinct row — the very failure that
    # mode exists to rule out (exact mode needs no hash at all)
    hashed = batch_df
    if hash_only:
        hashed = batch_df.withColumn(
            key_hash_col, F.xxhash64(*[F.col(k) for k in keys])
        )
    join_cols = [key_hash_col] if hash_only else list(keys)
    if num_partitions:
        # bucketed-store path: land the batch's ONE shuffle on the
        # store's bucket partitioning. Without this, dropDuplicates
        # shuffles to spark.sql.shuffle.partitions, the join sees
        # incompatible partition counts, and the planner re-shuffles
        # the STORE side every micro-batch (and disables its bucketed
        # scan) — the exact cost the bucketed store exists to avoid.
        # The explicit repartition is AQE-stable (user-specified
        # counts are not coalesced) and the aggregate reuses it.
        hashed = hashed.repartition(
            int(num_partitions), *[F.col(c) for c in join_cols]
        )
    return hashed.dropDuplicates(join_cols)


def _anti_join_seen(
    hashed: DataFrame, seen: DataFrame, join_cols: List[str], hash_only: bool
) -> DataFrame:
    if hash_only:
        return hashed.join(seen, join_cols, "left_anti")
    # NULL-SAFE equality in exact mode: a plain column-list
    # anti-join never matches a stored NULL key, so a row
    # with any NULL key column would be re-emitted (and its
    # key re-appended) every single batch. hash mode is
    # immune — xxhash64(NULL) is a concrete value.
    from functools import reduce

    a, b = hashed.alias("__qs_new"), seen.alias("__qs_seen")
    cond = reduce(
        lambda x, y: x & y,
        [
            F.col(f"__qs_new.{c}").eqNullSafe(F.col(f"__qs_seen.{c}"))
            for c in join_cols
        ],
    )
    return a.join(b, cond, "left_anti")


def dedup_against_bucketed_store(
    store_table: str,
    keys: Sequence[str],
    sink,
    buckets: int = 64,
    key_hash_col: str = "__qs_key_hash",
    hash_only: bool = True,
    path: Optional[str] = None,
):
    """The ingest-scale variant of :func:`dedup_against_store` — same
    contract (foreachBatch handler, cross-restart durable seen-key set,
    at-least-once sink-before-append), but the key store is a BUCKETED
    catalog table on the join key instead of a plain parquet path.

    Why bucketed: the plain-path store is re-read AND re-shuffled by
    the anti-join every micro-batch — at 100 TB-ingest key cardinality
    the store side dwarfs the batch side, so shuffling it per batch is
    the bottleneck. A table bucketed on the join key reads back with
    its HashPartitioning intact: the anti-join plan has NO Exchange on
    the store side (pinned in tests/test_streaming.py) — only the
    small micro-batch shuffles, into ``buckets`` partitions. After
    :func:`compact_key_store` (one sorted file per bucket) the store
    side needs no per-batch Sort either, so the probe cost is a pure
    streamed merge against pre-sorted buckets.

    Size ``buckets`` for the TARGET store: keys/bucket small enough
    that one bucket's parquet fits an executor's read (e.g. 4B 8-byte
    hash keys / 4096 buckets ≈ 8 MB a bucket). Appends add one file
    per bucket per batch; run :func:`compact_key_store` on a cadence
    (e.g. every N batches or nightly) to fold them and drop
    at-least-once replay duplicates.

    ``path`` makes the store an EXTERNAL table at that location (pass
    shared storage for a durable multi-run store; the caller owns the
    location's lifecycle); omitted, the session warehouse holds it.
    """
    if not 1 <= int(buckets) <= 1 << 20:
        raise ValueError(f"buckets out of range: {buckets}")

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        join_cols = [key_hash_col] if hash_only else list(keys)
        hashed = _hash_and_batch_dedup(
            batch_df, keys, key_hash_col, hash_only,
            num_partitions=int(buckets),
        )
        exists = spark.catalog.tableExists(store_table)
        if exists:
            seen = spark.table(store_table).select(*join_cols)
            fresh = _anti_join_seen(hashed, seen, join_cols, hash_only)
        else:
            fresh = hashed
        fresh = fresh.cache()
        try:
            sink(fresh.drop(key_hash_col), epoch_id)
            writer = (
                fresh.select(*join_cols)
                .write.mode("append")
                .format("parquet")
                .bucketBy(int(buckets), join_cols[0], *join_cols[1:])
                .sortBy(join_cols[0], *join_cols[1:])
            )
            if path is not None and not exists:
                writer = writer.option("path", path)
            writer.saveAsTable(store_table)
        finally:
            fresh.unpersist()

    return handle


def _store_meta(spark, store_table: str) -> dict:
    rows = spark.sql(f"DESCRIBE FORMATTED {store_table}").collect()
    return {r["col_name"].strip(): (r["data_type"] or "").strip() for r in rows}


def _hadoop_fs(spark, loc: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(loc)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _compaction_paths(loc: str):
    base = loc.rstrip("/")
    return base + "__compacting_stage", base + "__compacting_old"


#: LEGACY (pre-round-9) in-stage completion marker — only consulted
#: when recovering on-disk states left by the old single-marker
#: protocol. That protocol was unsound on copy+delete filesystems: a
#: crash mid rename(stage->loc) leaves {marked stage, loc, old} —
#: observably identical to a crash mid rename(loc->old), so no branch
#: choice could be right for both (ADVICE r08). The round-9 protocol
#: below distinguishes every crash window with two SIBLING sentinel
#: files that are never inside a directory being renamed.
_STAGE_MARKER = "_QS_STAGE_COMPLETE"


def _sentinel_paths(loc: str):
    """Two sibling sentinel FILES (atomic create/delete — never inside
    a directory that gets renamed, so copy+delete directory renames
    cannot tear them):

    - ``__stage_ready``: created after the staged compacted copy fully
      committed; DELETED immediately BEFORE rename(stage->loc) begins.
      Present => the stage dir is complete and untouched.
    - ``__old_complete``: created immediately AFTER rename(loc->old)
      returned; deleted AFTER rename(stage->loc) returned and BEFORE
      the old dir is removed. Present => the old dir is a complete
      pre-swap copy."""
    base = loc.rstrip("/")
    return base + "__stage_ready", base + "__old_complete"


def _touch(fs, jvm, path_str: str) -> None:
    out = fs.create(jvm.org.apache.hadoop.fs.Path(path_str), True)
    out.close()


def recover_key_store(spark, store_table: str) -> bool:
    """Finish (or clean up after) an interrupted :func:`compact_key_store`
    run. Idempotent; called automatically at the start of every
    compaction, and safe to call any time the stream is stopped.
    Returns True if a swap was completed or leftovers were removed.

    Recovery rules (EXTERNAL store — the table metadata is never
    dropped, so the only crash states are file-level). Decisions key
    on the two SIBLING sentinel files (see :func:`_sentinel_paths`):
    because ``__stage_ready`` is deleted BEFORE rename(stage->loc)
    starts and ``__old_complete`` is created AFTER rename(loc->old)
    returns and deleted BEFORE the old dir is removed, every crash
    window names exactly one provably-complete copy — including on
    filesystems where directory rename is COPY+DELETE (S3A and other
    object stores), the case the round-8 in-stage marker could not
    disambiguate (a crash mid rename(stage->loc) vs mid
    rename(loc->old) left identical observable states):

    - ``__stage_ready`` present -> the stage dir is a COMPLETE
      compacted copy and untouched by any rename; the store dir / old
      dir may each be partial remnants -> discard both, rename the
      stage into place. (Stray sentinel with no stage dir: removed.)
    - else ``__old_complete`` present -> the swap progressed past the
      stage's point of no return; the OLD dir is the complete
      pre-swap copy (it is never deleted while this sentinel exists)
      while stage/store may be partial -> discard stage + store
      remnants, restore old into place (the compaction itself re-runs
      later; no key is lost).
    - no sentinels (post-cleanup or legacy pre-round-9 states):
      - stage + store both present -> crash before any rename; store
        is authoritative -> delete the stage.
      - stage present, store missing: legacy protocol state — an
        in-stage ``_QS_STAGE_COMPLETE`` marker makes the stage
        authoritative over old (legacy rule, ambiguity documented at
        `_STAGE_MARKER`); otherwise old (if present) is restored,
        else the full stage is renamed into place.
      - old present -> store present: finished swap, delete old;
        store missing: restore old.

    MANAGED store: a crash between DROP and RENAME leaves the complete
    compacted data under ``<table>__compacting`` — if the store table
    is missing and the tmp table exists (Spark registers a CTAS table
    only AFTER its write job commits, so existence implies complete
    data), rename it into place."""
    tmp = store_table + "__compacting"
    acted = False
    if spark.catalog.tableExists(store_table):
        meta = _store_meta(spark, store_table)
        loc = meta.get("Location", "")
        if meta.get("Type", "").upper() == "EXTERNAL" and loc:
            stage_loc, old_loc = _compaction_paths(loc)
            ready_sent, oldok_sent = _sentinel_paths(loc)
            fs, jvm = _hadoop_fs(spark, loc)
            P = jvm.org.apache.hadoop.fs.Path
            stage_exists = fs.exists(P(stage_loc))
            loc_exists = fs.exists(P(loc))
            old_exists = fs.exists(P(old_loc))
            ready = fs.exists(P(ready_sent))
            oldok = fs.exists(P(oldok_sent))
            if ready and not stage_exists:
                # stray sentinel (manual tampering) — the protocol
                # never deletes/moves the stage while it exists
                fs.delete(P(ready_sent), False)
                ready = False
                acted = True
            if oldok and not old_exists:
                fs.delete(P(oldok_sent), False)
                oldok = False
                acted = True
            if ready:
                # __stage_ready => the stage is complete AND untouched
                # (the sentinel is removed before rename(stage->loc)
                # ever starts); store/old may be partial remnants
                if loc_exists:
                    fs.delete(P(loc), True)
                if old_exists:
                    fs.delete(P(old_loc), True)
                if not fs.rename(P(stage_loc), P(loc)):
                    raise IOError(f"recovery rename failed: {stage_loc} -> {loc}")
                fs.delete(P(ready_sent), False)
                if oldok:
                    fs.delete(P(oldok_sent), False)
                spark.sql(f"REFRESH TABLE {store_table}")
                return True
            if oldok:
                # __old_complete without __stage_ready => rename(
                # stage->loc) may have started: stage and store are
                # both untrusted; old is the complete pre-swap copy
                # (never deleted while this sentinel exists)
                if stage_exists:
                    fs.delete(P(stage_loc), True)
                if loc_exists:
                    fs.delete(P(loc), True)
                if not fs.rename(P(old_loc), P(loc)):
                    raise IOError(f"recovery rename failed: {old_loc} -> {loc}")
                fs.delete(P(oldok_sent), False)
                spark.sql(f"REFRESH TABLE {store_table}")
                return True
            # --- no sentinels: post-cleanup or legacy (pre-round-9)
            # protocol states ---
            legacy_marked = stage_exists and fs.exists(
                P(stage_loc + "/" + _STAGE_MARKER)
            )
            if legacy_marked and (old_exists or not loc_exists):
                # legacy rule: marked stage authoritative in-flight
                if loc_exists:
                    fs.delete(P(loc), True)
                if old_exists:
                    fs.delete(P(old_loc), True)
                if not fs.rename(P(stage_loc), P(loc)):
                    raise IOError(f"recovery rename failed: {stage_loc} -> {loc}")
                fs.delete(P(loc + "/" + _STAGE_MARKER), False)
                spark.sql(f"REFRESH TABLE {store_table}")
                acted = True
            elif stage_exists and not loc_exists and old_exists:
                # unmarked stage, pre-swap store survives under old
                fs.delete(P(stage_loc), True)
                if not fs.rename(P(old_loc), P(loc)):
                    raise IOError(f"recovery rename failed: {old_loc} -> {loc}")
                spark.sql(f"REFRESH TABLE {store_table}")
                acted = True
            elif stage_exists and not loc_exists:
                # legacy pre-marker stage: staged fully before renames
                if not fs.rename(P(stage_loc), P(loc)):
                    raise IOError(f"recovery rename failed: {stage_loc} -> {loc}")
                spark.sql(f"REFRESH TABLE {store_table}")
                acted = True
            elif stage_exists:
                fs.delete(P(stage_loc), True)
                acted = True
            if fs.exists(P(old_loc)):
                if not fs.exists(P(loc)):
                    if not fs.rename(P(old_loc), P(loc)):
                        raise IOError(
                            f"recovery rename failed: {old_loc} -> {loc}"
                        )
                    spark.sql(f"REFRESH TABLE {store_table}")
                else:
                    fs.delete(P(old_loc), True)
                acted = True
        if spark.catalog.tableExists(tmp):
            spark.sql(f"DROP TABLE {tmp}")
            acted = True
    elif spark.catalog.tableExists(tmp):
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {store_table}")
        acted = True
    return acted


def compact_key_store(spark, store_table: str) -> None:
    """Compact a :func:`dedup_against_bucketed_store` key store: fold
    the per-batch bucket files into ONE sorted file per bucket (same
    bucket spec), dropping any at-least-once replay duplicates. A
    freshly compacted store anti-joins with neither Exchange nor Sort
    on the store side.

    Crash contract: every run starts with :func:`recover_key_store`,
    and the swap itself is stage-then-rename — the compacted copy is
    fully written to a sibling staging directory (EXTERNAL) or a tmp
    table (managed) BEFORE the old data is touched. Two SIBLING
    sentinel files choreograph the swap (see :func:`_sentinel_paths`):
    ``__stage_ready`` is created once the stage committed and deleted
    immediately BEFORE rename(stage->loc) starts, and
    ``__old_complete`` is created immediately AFTER rename(loc->old)
    returns and deleted only after rename(stage->loc) returns —
    so at EVERY instant at least one sentinel (or the live store dir
    itself, outside the swap) names a provably-complete copy, even on
    filesystems where directory rename is copy+delete (S3A and other
    object stores) where a crashed rename leaves BOTH endpoints
    partial. (The round-8 single in-stage marker could not separate a
    crash mid rename(stage->loc) from one mid rename(loc->old) —
    identical observable states with opposite correct answers; the
    two-sentinel protocol makes them distinct by construction.)
    Re-running compact_key_store — or calling recover_key_store —
    completes or rolls back the interrupted swap; there is no window
    in which keys can be lost. A rollback restores the UNCOMPACTED
    pre-swap store; the next compaction simply redoes the work. (On
    atomic-rename filesystems — HDFS, local — the renames are
    metadata-only and the windows are single syscalls either way.)

    Concurrency: run it BETWEEN streaming triggers (stop the stream or
    schedule compaction in the same single-writer loop as the batches).
    A probe that reads the store DURING the swap can observe a missing
    directory; nothing in this function can guard a concurrent writer
    appending to the pre-swap table — those appends would be silently
    discarded by the swap."""
    recover_key_store(spark, store_table)
    meta = _store_meta(spark, store_table)
    nb = int(meta.get("Num Buckets", "0"))
    if nb <= 0:
        raise ValueError(f"{store_table} is not a bucketed table")
    cols = [c.strip().strip("`") for c in meta["Bucket Columns"].strip("[]").split(",")]
    is_external = meta.get("Type", "").upper() == "EXTERNAL"
    loc = meta.get("Location", "")
    df = spark.table(store_table)
    tmp = store_table + "__compacting"

    def bucketed_writer(frame):
        # repartition by the bucket columns into exactly nb partitions:
        # Spark's bucket id IS hash(cols) % nb, so each write task holds
        # one whole bucket -> exactly one file per bucket
        return (
            frame.repartition(nb, *[F.col(c) for c in cols])
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(nb, cols[0], *cols[1:])
            .sortBy(cols[0], *cols[1:])
        )

    compacted = df.dropDuplicates(df.columns)
    if is_external:
        # stage the complete compacted copy NEXT TO the store dir,
        # then swap via two FS renames (metadata-only on HDFS-likes;
        # the store's catalog entry is never dropped)
        stage_loc, old_loc = _compaction_paths(loc)
        ready_sent, oldok_sent = _sentinel_paths(loc)
        bucketed_writer(compacted).option("path", stage_loc).saveAsTable(tmp)
        spark.sql(f"DROP TABLE {tmp}")  # metadata only: files stay staged
        fs, jvm = _hadoop_fs(spark, loc)
        P = jvm.org.apache.hadoop.fs.Path
        # sentinel choreography (see _sentinel_paths): each sentinel
        # is a sibling FILE, so directory renames can never tear it,
        # and every crash instant leaves exactly one sentinel naming a
        # provably-complete copy
        _touch(fs, jvm, ready_sent)  # stage complete, untouched
        if not fs.rename(P(loc), P(old_loc)):
            raise IOError(f"compaction rename failed: {loc} -> {old_loc}")
        _touch(fs, jvm, oldok_sent)  # old is the complete pre-swap copy
        fs.delete(P(ready_sent), False)  # stage about to be touched
        if not fs.rename(P(stage_loc), P(loc)):
            raise IOError(f"compaction rename failed: {stage_loc} -> {loc}")
        fs.delete(P(oldok_sent), False)  # loc complete; old expendable
        fs.delete(P(old_loc), True)
        spark.sql(f"REFRESH TABLE {store_table}")
    else:
        bucketed_writer(compacted).saveAsTable(tmp)
        spark.sql(f"DROP TABLE {store_table}")
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {store_table}")


def sessionized_stream_stats(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    aggs: Optional[Sequence[Column]] = None,
) -> DataFrame:
    """Streaming sessionization via Spark's NATIVE ``session_window``
    (round 7 — the streaming twin of ``operators/temporal.sessionize``):
    events within ``gap`` of each other merge into one session per key;
    ``session_end`` = last event + gap (a new session starts only when
    the inter-event gap EXCEEDS ``gap`` — an event landing exactly on
    the previous session's end still merges; pinned by test). The
    watermark bounds state: sessions whose end falls behind it finalize
    and drop their state, and the built-in operator handles
    merge-on-late-event within the horizon — the logic a hand-rolled
    mapGroupsWithState sessionizer would have to re-implement.

    At scale: one shuffle on the session keys; state per OPEN session
    only (bounded by the watermark), not per event. Accepts a batch
    DataFrame too (no watermark applied) — identical results, which is
    how the oracle replays it."""
    agg_exprs = list(aggs) if aggs else [
        F.count(F.lit(1)).cast("int").alias("n_events")
    ]
    base = _watermarkable(df, ts_col)
    if df.isStreaming:
        base = base.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    out = base.groupBy(win, *[F.col(k) for k in keys]).agg(*agg_exprs)
    agg_names = [
        c for c in out.columns if c != "session_window" and c not in keys
    ]
    return out.select(
        *keys,
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *agg_names,
    )


def _scd2_versions(spark, store_path: str) -> List[int]:
    """Complete (_SUCCESS-marked) version ids in an SCD2 store,
    ascending."""
    import os

    fs, jvm = _hadoop_fs(spark, store_path)
    base = jvm.org.apache.hadoop.fs.Path(store_path)
    if not fs.exists(base):
        return []
    out = []
    for st in fs.listStatus(base):
        name = st.getPath().getName()
        if not name.startswith("version="):
            continue
        try:
            v = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if fs.exists(
            jvm.org.apache.hadoop.fs.Path(
                os.path.join(store_path, name, "_SUCCESS")
            )
        ):
            out.append(v)
    return sorted(out)


def read_scd2_store(spark, store_path: str) -> Optional[DataFrame]:
    """The CURRENT SCD2 table: the highest complete version in the
    store (parquet's _SUCCESS marker is the commit record — a crashed
    half-written version is invisible). None when the store is
    empty."""
    vs = _scd2_versions(spark, store_path)
    if not vs:
        return None
    return spark.read.parquet(f"{store_path}/version={vs[-1]}")


def scd2_to_store(
    store_path: str,
    keys: Sequence[str],
    attrs: Sequence[str],
    ts_col: str = "ts",
    order_cols: Optional[Sequence[str]] = None,
    keep_versions: int = 2,
):
    """``foreachBatch`` handler maintaining a versioned SCD2 dimension
    from a stream: each micro-batch folds into the store's current
    table via ``operators.temporal.scd2_apply`` and commits the merged
    result as ``store_path/version=<epoch_id>``.

    EXACTLY-ONCE by construction: foreachBatch replays a failed epoch
    under the SAME epoch_id, and the handler SKIPS any epoch whose
    version dir is already _SUCCESS-complete — so a restart can
    neither double-apply a batch (which would fabricate spurious
    versions when one batch carried multiple updates per key) nor
    lose one. A crash mid-write leaves a markerless dir the next read
    ignores and the replay overwrites.

    Cost model: one full dimension rewrite per batch — the SCD2 table
    is dimension-sized (users/hosts/products), orders of magnitude
    under the event stream it versions; ``keep_versions`` old
    versions are retained for readers-in-flight / time travel, older
    ones deleted after each commit. Updates are assumed to arrive in
    epoch order per key across batches (the streaming-ingest contract
    of scd2_apply)."""
    from ..operators.temporal import scd2_apply

    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    keys = list(keys)
    attrs = list(attrs)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        import os

        spark = batch_df.sparkSession
        done = _scd2_versions(spark, store_path)
        if int(epoch_id) in done:
            return  # replayed epoch: already committed
        cur = read_scd2_store(spark, store_path)
        if cur is None:
            ts_type = dict(batch_df.dtypes)[ts_col]
            cur = batch_df.select(
                *keys,
                *attrs,
                F.col(ts_col).alias("valid_from"),
                F.lit(None).cast(ts_type).alias("valid_to"),
            ).limit(0)
        merged = scd2_apply(
            cur, batch_df, keys, attrs, ts_col=ts_col, order_cols=order_cols
        )
        merged.write.mode("overwrite").parquet(
            f"{store_path}/version={int(epoch_id)}"
        )
        vs = _scd2_versions(spark, store_path)
        fs, jvm = _hadoop_fs(spark, store_path)
        for v in vs[: max(0, len(vs) - int(keep_versions))]:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(
                    os.path.join(store_path, f"version={v}")
                ),
                True,
            )

    return handle


#: Above this many distinct bucket ids the probe's static IN-literal
#: pruning stops pruning anything (a large backfill batch touches most
#: buckets) and only bloats the plan — switch to a broadcast semi-join.
_ISIN_PRUNE_MAX = 128

#: Settle window between writing the compaction sentinel token and
#: reading it back (ADVICE r12): the token handshake only excludes a
#: rival whose create→write gap is shorter than this window. 1 s is
#: orders of magnitude above object-store RPC latency, and compaction
#: is a rare heavyweight operation, so the latency is immaterial.
#: Tests shrink it to keep the suite fast.
_SENTINEL_SETTLE_SECONDS = 1.0


def _pruned_store_scan(spark, base, live_dirs, part_col, buckets_df):
    """Partition-pruned scan of a bucketed epoch-dir store table
    (sigs/idmap): committed epoch dirs + the batch's distinct bucket
    ids. Small bucket sets inline as an IN literal list (static
    partition pruning — whole directories skipped at plan time); past
    ``_ISIN_PRUNE_MAX`` distinct buckets the scan falls back to a
    broadcast LEFT SEMI join on the bucket column (VERDICT r11 #6) —
    identical rows, join-based pruning instead of a giant In list.
    Returns None when the batch touches no buckets at all. The
    ``limit(MAX+1)`` sample doubles as the literal list: when it comes
    back <= MAX rows it IS the complete distinct set."""
    sample = buckets_df.limit(_ISIN_PRUNE_MAX + 1).collect()
    if not sample:
        return None
    scan = (
        spark.read.option("basePath", base)
        .parquet(base)
        .filter(F.col("epoch").isin(live_dirs))
    )
    if len(sample) <= _ISIN_PRUNE_MAX:
        return scan.filter(
            F.col(part_col).isin([r[part_col] for r in sample])
        )
    return scan.join(F.broadcast(buckets_df), part_col, "left_semi")


def _neardup_versions(spark, store_path: str):
    """Committed alias versions of a near-dup store, ascending — a
    version counts only when its ``epochs/`` commit table is
    _SUCCESS-complete (written LAST, so it is the commit record for
    the whole epoch: idmap/sigs/alias table are all on disk before
    it appears)."""
    import os

    aliases = os.path.join(store_path, "aliases")
    fs, jvm = _hadoop_fs(spark, aliases)
    base = jvm.org.apache.hadoop.fs.Path(aliases)
    if not fs.exists(base):
        return []
    out = []
    for st in fs.listStatus(base):
        name = st.getPath().getName()
        if not name.startswith("version="):
            continue
        try:
            v = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if fs.exists(
            jvm.org.apache.hadoop.fs.Path(
                os.path.join(aliases, name, "epochs", "_SUCCESS")
            )
        ):
            out.append(v)
    return sorted(out)


def _neardup_committed(spark, store_path: str):
    """(committed epoch ids ascending, newest alias version) — the
    cumulative epoch list rides in the newest version's ``epochs/``
    table, so pruning OLD alias versions never loses history."""
    vs = _neardup_versions(spark, store_path)
    if not vs:
        return [], None
    eps = [
        int(r["epoch"])
        for r in spark.read.parquet(
            f"{store_path}/aliases/version={vs[-1]}/epochs"
        ).collect()
    ]
    return sorted(eps), vs[-1]


def _neardup_live_dirs(spark, store_path: str, eps):
    """The physical ``epoch=<d>`` directory ids currently holding the
    committed state: the committed epochs, minus dirs folded away by
    committed compactions, plus the compactions' consolidated dirs
    (negative ids — they can never collide with a future foreachBatch
    epoch). Uncommitted epoch dirs (crashed batches) and orphaned
    consolidated dirs (crashed compactions) are excluded by
    construction — neither appears in the committed lists."""
    import os

    live = set(int(e) for e in eps)
    gens = _neardup_compaction_gens(spark, store_path)
    if gens:
        # each gen's fold map is CUMULATIVE (every original epoch and
        # prior consolidated dir maps directly to its current home),
        # so only the NEWEST committed gen is consulted — reads stay
        # O(1) in the number of compactions ever run
        rows = spark.read.parquet(
            f"{store_path}/compactions/gen={gens[-1]}"
        ).collect()
        for r in rows:
            live.discard(int(r["folded_dir"]))
            live.add(int(r["new_dir"]))
    return sorted(live)


def _neardup_compaction_gens(spark, store_path: str):
    """Committed compaction generations, ascending (_SUCCESS-marked)."""
    import os

    comp_dir = os.path.join(store_path, "compactions")
    fs, jvm = _hadoop_fs(spark, comp_dir)
    base = jvm.org.apache.hadoop.fs.Path(comp_dir)
    if not fs.exists(base):
        return []
    gens = []
    for st in fs.listStatus(base):
        name = st.getPath().getName()
        if not name.startswith("gen="):
            continue
        try:
            g = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if fs.exists(
            jvm.org.apache.hadoop.fs.Path(
                os.path.join(comp_dir, name, "_SUCCESS")
            )
        ):
            gens.append(g)
    return sorted(gens)


def compact_neardup_store(
    spark, store_path: str, force: bool = False
) -> None:
    """Consolidate the near-dup store's committed idmap/sigs epoch
    dirs into ONE dir each — the small-files maintenance of
    `compact_pq_index`, for the stream store (every micro-batch adds
    an epoch dir with id_buckets/band_buckets files; a long stream
    accumulates thousands). Rows are EXACTLY preserved (pinned by
    tests): the consolidation is a pruned read + rewrite under a
    fresh NEGATIVE dir id (which a future foreachBatch epoch can
    never collide with), committed by an append-only
    ``compactions/gen=N`` log entry (_SUCCESS is the commit record)
    that maps folded dirs to the consolidated one. Crash anywhere
    before that commit leaves the old dirs live and at most an
    orphaned consolidated dir that no reader references (cleaned by
    the next compaction); the old dirs are deleted only AFTER the
    commit. Epoch replay-skipping is untouched — the committed-epoch
    LIST lives in the alias versions and never changes here.

    ONE-WRITER CONTRACT (ADVICE r11): the stream must be quiesced
    before compacting — the pre-cleanup below deletes every epoch dir
    outside the committed live set, which would destroy an in-flight
    batch's half-written dirs. Asserted two ways: (a) a
    ``compactions/_COMPACTING`` sentinel held for the duration makes
    concurrent ``neardup_to_store`` batches fail loudly at entry;
    (b) compaction refuses to start while any ``_inflight/epoch=N``
    marker exists (a batch between entry and commit). A CRASHED batch
    also leaves its marker — it clears when the stream restart
    replays that epoch; if the checkpoint was abandoned and the epoch
    will never replay, pass ``force=True`` (safe then: the orphaned
    dirs are unreferenced by construction). A crashed compaction
    leaves the sentinel — delete the file and re-run."""
    import os
    import uuid

    from ..sources import fsio

    fs, jvm = _hadoop_fs(spark, store_path)
    sentinel = fsio.join(store_path, "compactions", "_COMPACTING")
    # Sentinel BEFORE anything else — posting it first closes the
    # interleaving with neardup_to_store (which posts its marker
    # before checking this sentinel: whichever order the two writers
    # run in, one sees the other). create_new is atomic on HDFS/ABFS;
    # on S3A/local-FS it can double-win, so a unique TOKEN is written,
    # allowed to SETTLE, and read back. The settle barrier (ADVICE
    # r12) is what makes the handshake effective: without it, a
    # caller that completes write+read before the rival's write lands
    # sees its own token and both proceed — the mutual exclusion only
    # holds when both writes precede both reads. Sleeping a fixed
    # window between write and read-back makes that ordering hold
    # whenever the rival's create→write gap is under the window
    # (single-digit RPC latencies in practice). This is BEST-EFFORT
    # exclusion, not a proof: a rival stalled longer than the window
    # can still double-win; the loser-aborts outcome (possibly both,
    # fail-safe) covers every ordering the barrier does catch.
    fsio.makedirs(fsio.join(store_path, "compactions"))
    if not fsio.create_new(sentinel):
        raise RuntimeError(
            "compact_neardup_store: compactions/_COMPACTING already "
            "present — another compaction is running, or a previous "
            "one crashed (delete the sentinel file to recover)."
        )
    token = uuid.uuid4().hex
    fsio.write_text(sentinel, token)
    import time as _time

    _time.sleep(_SENTINEL_SETTLE_SECONDS)
    if fsio.read_text(sentinel) != token:
        raise RuntimeError(
            "compact_neardup_store: lost the sentinel race to a "
            "concurrent compaction — retry after it finishes."
        )
    try:
        if not force:
            markers = [
                n
                for n in fsio.list_names(
                    fsio.join(store_path, "_inflight")
                )
                if n.startswith("epoch=")
            ]
            if markers:
                raise RuntimeError(
                    "compact_neardup_store: in-flight batch markers "
                    f"present ({markers}) — quiesce the stream first. "
                    "If these are from crashed batches of an "
                    "ABANDONED checkpoint (the epochs will never "
                    "replay), pass force=True."
                )
        # the committed-state snapshot is taken INSIDE the sentinel
        # window: a batch that committed between an earlier snapshot
        # and the sentinel would otherwise have its epoch dirs
        # deleted as 'orphans' by the pre-cleanup (review r12)
        eps, _ver = _neardup_committed(spark, store_path)
        if not eps:
            return
        dirs = _neardup_live_dirs(spark, store_path, eps)
        if len(dirs) <= 1:
            return
        _compact_neardup_body(spark, store_path, eps, dirs, fs, jvm)
    finally:
        fsio.delete(sentinel)


def _compact_neardup_body(spark, store_path, eps, dirs, fs, jvm):
    import os

    # cleanup: physical epoch dirs no reader references (crashed
    # batches / crashed compactions) — safe to drop before we start
    for table in ("idmap", "sigs"):
        tdir = os.path.join(store_path, table)
        tbase = jvm.org.apache.hadoop.fs.Path(tdir)
        if not fs.exists(tbase):
            continue
        for st in fs.listStatus(tbase):
            name = st.getPath().getName()
            if not name.startswith("epoch="):
                continue
            try:
                d = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if d not in dirs:
                fs.delete(st.getPath(), True)
    new_dir = -(max(abs(d) for d in dirs) + 1)
    for table, part in (("idmap", "idb"), ("sigs", "bb")):
        src = (
            spark.read.option("basePath", f"{store_path}/{table}")
            .parquet(f"{store_path}/{table}")
            .filter(F.col("epoch").isin(dirs))
            .drop("epoch")
        )
        src.repartition(part).write.mode("overwrite").partitionBy(
            part
        ).parquet(f"{store_path}/{table}/epoch={new_dir}")
    # COMMIT: the compaction log entry (gen = |new_dir| keeps gens
    # strictly increasing). The fold map is CUMULATIVE — folded dirs
    # this round PLUS every previously-folded dir remapped straight to
    # the new consolidated dir — so readers only ever consult the
    # newest gen and older gens can be deleted.
    fold = {int(d): int(new_dir) for d in dirs}
    prev_gens = _neardup_compaction_gens(spark, store_path)
    if prev_gens:
        for r in spark.read.parquet(
            f"{store_path}/compactions/gen={prev_gens[-1]}"
        ).collect():
            fold[int(r["folded_dir"])] = int(new_dir)
    spark.createDataFrame(
        sorted(fold.items()), "folded_dir bigint, new_dir bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{store_path}/compactions/gen={abs(new_dir)}"
    )
    for table in ("idmap", "sigs"):
        for d in dirs:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(
                    os.path.join(store_path, table, f"epoch={d}")
                ),
                True,
            )
    for g in prev_gens:  # superseded by the cumulative map
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(
                os.path.join(store_path, "compactions", f"gen={g}")
            ),
            True,
        )


def read_neardup_store(spark, store_path: str) -> Optional[DataFrame]:
    """The CURRENT near-dup state: (id, root, sh, bands, keep) —
    ``root`` is the GLOBAL min id of the document's near-dup
    component over everything ingested so far and ``keep = (id ==
    root)`` is the keeper election. Assembled from the append-only
    idmap (committed epochs only, through any compactions) resolved
    through the newest alias table (broadcast — it is
    merge-event-sized); None when empty."""
    eps, ver = _neardup_committed(spark, store_path)
    if not eps:
        return None
    dirs = _neardup_live_dirs(spark, store_path, eps)
    idmap = (
        spark.read.option("basePath", f"{store_path}/idmap")
        .parquet(f"{store_path}/idmap")
        .filter(F.col("epoch").isin(dirs))
    )
    alias = spark.read.parquet(
        f"{store_path}/aliases/version={ver}/table"
    )
    return (
        idmap.join(
            F.broadcast(alias),
            idmap["root0"] == alias["dead_root"],
            "left",
        )
        .select(
            "id",
            F.coalesce("live_root", "root0").alias("root"),
            "sh",
            "bands",
        )
        .withColumn("keep", F.col("id") == F.col("root"))
    )


def neardup_to_store(
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    mode: str = "fast",
    keep_versions: int = 2,
    band_buckets: int = 32,
    id_buckets: int = 32,
):
    """``foreachBatch`` handler for STREAMING near-duplicate dedup
    (VERDICT r10 next #7): each micro-batch dedups against the whole
    ingest history WITHOUT rescanning it, and the store's keeper set
    after the stream equals ``llm.dedup.dedup_near`` run once over
    the union of all batches (pinned like scd2_to_store).

    Why the equality is exact and not approximate:

    - Candidate edges are LSH band collisions, and band hashes are
      DETERMINISTIC functions of the text — so a pair band-collides
      in the streamed fold iff it band-collides in the one-shot run,
      no matter which batches the two docs arrived in (the later
      doc's batch probes the stored signatures and finds the pair).
      Every candidate is then verified with the IDENTICAL exact
      shingle-Jaccard >= threshold test `minhash_lsh_pairs` applies,
      using the history side's STORED shingle array (written verbatim
      at its own ingest, so the arrays are the same arrays).
    - A document's CURRENT root (= min id of its component so far,
      `connected_components`' own representative, so keep = id ==
      root is exactly `dedup_near`'s election) resolves as
      ``alias.get(root0, root0)``: ``root0`` is the root at the
      doc's OWN ingest, frozen in the append-only idmap, and the
      alias table maps roots that later DIED (absorbed by a merge)
      to their live successor. A retroactive merge — a new doc
      bridging two previously-separate components, the case
      first-seen folds get wrong — is one new alias entry; the old
      keeper demotes without touching any of its component's rows.
      Aliases are PATH-COMPRESSED every batch (targets are always
      live), so resolution is a single broadcast join, and the table
      is merge-event-sized (one row per dead root, NOT per doc —
      worst case #components-ever-created ≈ #docs in an adversarial
      everything-merges corpus, typically orders of magnitude
      smaller; if it ever outgrows broadcast, swap the resolve joins
      to plain shuffles — correctness is unchanged).

    100 TB shape — everything corpus-sized is APPEND-ONLY and pruned:

    - ``idmap/epoch=E/idb=…`` — (id, root0, sh, bands) written once
      per doc at its ingest epoch; candidate lookups prune to the
      id-hash buckets of the batch's matched ids.
    - ``sigs/epoch=E/bb=…`` — exploded band signatures bucketed by
      band hash; a batch's probe prunes to ITS band buckets
      (PartitionFilters — the BM25-postings pattern), never a state
      scan.
    - ``aliases/version=N/{table,epochs}`` — the ONLY mutable piece,
      rewritten per batch, but merge-event-sized. ``epochs/`` (the
      cumulative committed-epoch list) commits LAST: that makes the
      whole epoch atomic — a crash anywhere earlier leaves idmap/sigs
      epoch dirs that every reader ignores (not in the committed
      list) and the replay OVERWRITES (per-epoch dirs, idempotent).
      Replayed committed epochs are skipped. Old alias versions are
      pruned to ``keep_versions``; the cumulative list rides along.

    Per-batch driver traffic: the batch's band/id bucket lists and
    nothing else. The mini component merge runs over batch ids +
    touched live roots only (batch-sized), never history.

    Caller contract: ids unique across the whole stream (dedup EXACT
    duplicates upstream — this store's job is NEAR-dups); one writer.
    Elections are min-id (`dedup_near`'s default); score-based
    election is not offered because a later higher-score arrival
    would have to unseat a keeper downstream consumers already acted
    on."""
    from ..llm.dedup import (
        bucket_candidate_pairs,
        connected_components,
        with_minhash,
        with_shingles,
    )
    from ..plans.blocks import release_local_checkpoint

    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    if not (0.0 < float(threshold) <= 1.0):
        raise ValueError("threshold must be in (0, 1]")

    def _state_of(batch_df: DataFrame) -> DataFrame:
        sig = with_minhash(
            batch_df, text_col, k, num_perm, bands, mode, id_col=id_col
        ).select(
            F.col(id_col).alias("id"),
            F.array(
                *[F.col(f"band_{b}") for b in range(bands)]
            ).alias("bands"),
        )
        sh = with_shingles(batch_df, text_col, k, out="__sh").select(
            F.col(id_col).alias("id"), F.col("__sh").alias("sh")
        )
        return sig.join(sh, "id")

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        import os

        from ..sources import fsio

        spark = batch_df.sparkSession
        inflight = fsio.join(
            store_path, "_inflight", f"epoch={int(epoch_id)}"
        )
        eps, ver = _neardup_committed(spark, store_path)
        if int(epoch_id) in eps:
            # replayed epoch: already committed. A crash BETWEEN the
            # epoch commit and the marker delete leaves a stale
            # marker that would block compaction forever — this is
            # the replay that clears it.
            fsio.delete(inflight)
            return
        # Writer exclusion vs compact_neardup_store (one-writer
        # contract), ordered POST-INTENT-FIRST so the check-then-act
        # window closes: the batch publishes its in-flight marker
        # BEFORE checking the compaction sentinel, and compaction
        # creates its sentinel BEFORE listing markers. Whichever
        # order the two writers interleave in, at least one sees the
        # other's intent: a compaction that misses this marker
        # necessarily created its sentinel first, so the check below
        # fires and the batch rolls back its marker. The marker is
        # removed on commit; a crashed batch leaves it until the
        # epoch replays (above) — see compact_neardup_store(force=)
        # for abandoned checkpoints.
        fsio.makedirs(fsio.join(store_path, "_inflight"))
        fsio.write_text(inflight, "")
        if fsio.exists(
            fsio.join(store_path, "compactions", "_COMPACTING")
        ):
            fsio.delete(inflight)
            raise RuntimeError(
                "neardup_to_store: a compact_neardup_store run is in "
                "progress (compactions/_COMPACTING present) — the "
                "store has a one-writer contract. If the compaction "
                "crashed, delete the sentinel file and re-run it."
            )
        live_dirs = _neardup_live_dirs(spark, store_path, eps) if eps else []
        new_state = _state_of(batch_df).localCheckpoint(eager=True)
        new_sigs = new_state.select(
            "id", F.posexplode("bands").alias("band_idx", "band_hash")
        ).filter(F.col("band_hash").isNotNull())
        bb_col = F.pmod(
            F.xxhash64("band_idx", "band_hash"), F.lit(int(band_buckets))
        )
        # candidate pairs: within-batch band buckets + batch-vs-history
        # probe of the band-bucketed signature store, pruned to the
        # batch's OWN band buckets and the committed epochs
        cand = bucket_candidate_pairs(
            new_sigs, ("band_idx", "band_hash")
        ).select("id_a", "id_b")
        prev_alias = None
        if eps:
            hist_sigs = _pruned_store_scan(
                spark,
                f"{store_path}/sigs",
                live_dirs,
                "bb",
                new_sigs.select(bb_col.alias("bb")).distinct(),
            )
            if hist_sigs is not None:
                vs_hist = (
                    hist_sigs.join(
                        F.broadcast(
                            new_sigs.select(
                                F.col("id").alias("new_id"),
                                "band_idx",
                                "band_hash",
                            )
                        ),
                        ["band_idx", "band_hash"],
                    )
                    .select(
                        F.least("id", "new_id").alias("id_a"),
                        F.greatest("id", "new_id").alias("id_b"),
                    )
                    .filter(F.col("id_a") != F.col("id_b"))
                )
                cand = cand.unionByName(vs_hist)
            prev_alias = spark.read.parquet(
                f"{store_path}/aliases/version={ver}/table"
            )
        cand = cand.dropDuplicates(["id_a", "id_b"]).localCheckpoint(
            eager=True
        )
        # matched HISTORY ids -> pruned idmap read (their id-hash
        # buckets only) for shingles + frozen root0
        hist_rows = None
        if eps:
            matched = (
                cand.select(F.col("id_a").alias("id"))
                .unionByName(cand.select(F.col("id_b").alias("id")))
                .distinct()
                .join(new_state.select("id"), "id", "left_anti")
            )
            idb_df = matched.select(
                F.pmod(
                    F.xxhash64(F.col("id").cast("string")),
                    F.lit(int(id_buckets)),
                ).alias("idb")
            ).distinct()
            probe = _pruned_store_scan(
                spark, f"{store_path}/idmap", live_dirs, "idb", idb_df
            )
            if probe is not None:
                hist_rows = (
                    probe.join(F.broadcast(matched), "id")
                    .select("id", "root0", "sh")
                    .localCheckpoint(eager=True)
                )
        # exact-Jaccard verify — the minhash_lsh_pairs test verbatim,
        # history shingles read from the store
        all_sh = new_state.select("id", "sh")
        if hist_rows is not None:
            all_sh = all_sh.unionByName(hist_rows.select("id", "sh"))
        fetched = cand.join(
            all_sh.select(
                F.col("id").alias("id_a"), F.col("sh").alias("sh_a")
            ),
            "id_a",
        ).join(
            all_sh.select(
                F.col("id").alias("id_b"), F.col("sh").alias("sh_b")
            ),
            "id_b",
        )
        edges = fetched.filter(
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            )
            >= float(threshold)
        ).select("id_a", "id_b")
        # map history endpoints to their CURRENT (resolved) roots, so
        # the component merge is a mini-CC over batch ids + touched
        # live roots — batch-sized, never a history scan
        if hist_rows is not None:
            res = hist_rows.join(
                F.broadcast(prev_alias),
                hist_rows["root0"] == prev_alias["dead_root"],
                "left",
            ).select(
                "id", F.coalesce("live_root", "root0").alias("r")
            )
            edges = (
                edges.join(
                    res.withColumnRenamed("id", "id_a").withColumnRenamed(
                        "r", "__ra"
                    ),
                    "id_a",
                    "left",
                )
                .join(
                    res.withColumnRenamed("id", "id_b").withColumnRenamed(
                        "r", "__rb"
                    ),
                    "id_b",
                    "left",
                )
                .select(
                    F.coalesce("__ra", "id_a").alias("id_a"),
                    F.coalesce("__rb", "id_b").alias("id_b"),
                )
                .filter(F.col("id_a") != F.col("id_b"))
            )
        comp = connected_components(edges).localCheckpoint(eager=True)
        # 1. idmap epoch dir (append-only; per-epoch overwrite makes
        # replays idempotent): batch rows with their FINAL root0
        idmap_rows = (
            new_state.join(
                F.broadcast(
                    comp.select("id", F.col("component").alias("__nr"))
                ),
                "id",
                "left",
            )
            .select(
                "id",
                F.coalesce("__nr", "id").alias("root0"),
                "sh",
                "bands",
                F.pmod(
                    F.xxhash64(F.col("id").cast("string")),
                    F.lit(int(id_buckets)),
                ).alias("idb"),
            )
        )
        idmap_rows.write.mode("overwrite").partitionBy("idb").parquet(
            f"{store_path}/idmap/epoch={int(epoch_id)}"
        )
        # 2. sigs epoch dir (band-bucketed probe index)
        new_sigs.withColumn("bb", bb_col).write.mode(
            "overwrite"
        ).partitionBy("bb").parquet(
            f"{store_path}/sigs/epoch={int(epoch_id)}"
        )
        # 3. alias update: newly-dead LIVE roots alias to their merged
        # root; existing entries path-compress through the merge
        if hist_rows is not None:
            live_roots = res.select(F.col("r").alias("id")).distinct()
            new_entries = (
                comp.filter(F.col("id") != F.col("component"))
                .join(live_roots, "id")
                .select(
                    F.col("id").alias("dead_root"),
                    F.col("component").alias("live_root"),
                )
            )
            retargeted = (
                prev_alias.join(
                    F.broadcast(
                        comp.withColumnRenamed("id", "live_root")
                    ),
                    "live_root",
                    "left",
                )
                .select(
                    "dead_root",
                    F.coalesce("component", "live_root").alias(
                        "live_root"
                    ),
                )
            )
            alias_new = retargeted.unionByName(new_entries)
        elif prev_alias is not None:
            # no candidate pairs against history this batch, but the
            # store already holds merge aliases: carry them forward
            # verbatim — readers consult ONLY the newest version, so an
            # empty table here would silently resurrect demoted keepers
            alias_new = prev_alias
        else:
            alias_new = (
                new_state.select(
                    F.col("id").alias("dead_root"),
                    F.col("id").alias("live_root"),
                ).limit(0)
            )
        vdir = f"{store_path}/aliases/version={int(epoch_id)}"
        alias_new.write.mode("overwrite").parquet(f"{vdir}/table")
        # 4. COMMIT: the cumulative epoch list, written last
        spark.createDataFrame(
            [(e,) for e in eps + [int(epoch_id)]], "epoch bigint"
        ).coalesce(1).write.mode("overwrite").parquet(f"{vdir}/epochs")
        fsio.delete(inflight)
        release_local_checkpoint(new_state)
        release_local_checkpoint(cand)
        release_local_checkpoint(comp)
        if hist_rows is not None:
            release_local_checkpoint(hist_rows)
        vs = _neardup_versions(spark, store_path)
        for v in vs[: max(0, len(vs) - int(keep_versions))]:
            fsio.delete(
                fsio.join(store_path, "aliases", f"version={v}"),
                recursive=True,
            )

    return handle


def pq_appends_to_store(
    store_path: str,
    vec_col: str = "embedding",
    encode_mode: str = "sql",
    cell_mode: str = "sql",
    monitor_qe: bool = False,
):
    """``foreachBatch`` handler folding VECTOR batches into an
    existing `llm.pq.write_pq_index` store — the streaming face of
    `append_pq_index` (round 11): a growing embedding corpus keeps
    its ANN index current without ever re-encoding history.

    The store must exist (bootstrap with ``write_pq_index`` over the
    initial corpus — that is also where the centroids/codebooks are
    FIXED; see append_pq_index's re-train discipline for drift).
    EXACTLY-ONCE rides the store's own epoch ledger: the ledger entry
    commits inside append_pq_index's sentinel window, so a replayed
    epoch is skipped and NO crash point lets a replay double-append
    (an interrupted append leaves the fail-loud sentinel and readers
    refuse the store — restore or rebuild, the documented contract).
    Streamed appends == one bulk rebuild with the same centroids,
    bit-equal (append_pq_index's pinned property, per batch).

    ``monitor_qe=True`` records each batch's quantization error in
    the ledger (one extra batch aggregate); read it back with
    `llm.pq.pq_drift_report` against the build-time baseline
    (``write_pq_index(record_stats=True)``) — the operational
    re-train trigger for the frozen centroids."""
    from ..llm.pq import append_pq_index

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        append_pq_index(
            batch_df, store_path, vec_col=vec_col,
            encode_mode=encode_mode, cell_mode=cell_mode,
            epoch=int(epoch_id), record_stats=monitor_qe,
        )

    return handle


def bm25_appends_to_store(store_path: str, text_col: str = "text"):
    """``foreachBatch`` handler folding DOCUMENT batches into an
    existing `llm.retrieval.write_bm25_index` store — the lexical
    twin of `pq_appends_to_store`, completing the streaming lifecycle
    for both retrieval index families. Bootstrap with
    write_bm25_index; EXACTLY-ONCE rides append_bm25_index's epoch
    ledger, committed before the store's atomic meta swap so a
    replayed epoch is skipped and no crash point double-appends (an
    interrupted append leaves the fail-loud sentinel; restore the
    snapshot — ledger included — or rebuild). Batch ids must be
    disjoint from the store's across the whole stream: compose with
    the first-seen/key-store dedup recipes upstream."""
    from ..llm.retrieval import append_bm25_index

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        append_bm25_index(
            batch_df, store_path, text_col=text_col, epoch=int(epoch_id)
        )

    return handle


def corr_shards_to_store(store_path: str, cols: Sequence[str]):
    """``foreachBatch`` handler: land a MERGEABLE correlation artifact
    per micro-batch (`operators.stats.corr_shard` — one row of exact
    DECIMAL accumulators for every column pair) under
    ``store_path/epoch=<id>``. Whole-history cross-column
    correlations are then ``corr_from_shards([read store_path],
    cols)`` WITHOUT rescanning any batch — the profile-artifact
    store pattern extended to relationship monitoring ("did price
    stop tracking quantity this week?"), still one combinable
    aggregate per batch. Epoch partitioning keeps the store
    append-only and replay-safe (a re-run overwrites only its own
    epoch dir)."""
    from ..operators.stats import corr_shard

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        corr_shard(batch_df, list(cols)).write.mode("overwrite").parquet(
            f"{store_path}/epoch={int(epoch_id)}"
        )

    return handle
