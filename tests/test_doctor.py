"""Store doctor: every crash-window state the store protocols can
leave behind is diagnosable from the layout alone, metadata-priced."""

from __future__ import annotations

import json
import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from quality_spark.doctor import (
    check_bm25_store,
    check_neardup_store,
    check_pq_store,
)


def _codes(rep):
    return sorted(f["code"] for f in rep["findings"])


def test_doctor_pq_store_states(spark, sf_dir, tmp_path):
    from quality_spark.llm.pq import (
        append_pq_index,
        pq_codebooks_procedural,
        write_pq_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dims = len(emb.select("embedding").first()["embedding"])
    books = pq_codebooks_procedural(4, 16, dims // 4)
    idx = f"file://{tmp_path}/pq"  # URI path: doctor must be portable
    write_pq_index(emb.filter("vec_id % 2 = 0"), books, idx)
    append_pq_index(emb.filter("vec_id % 2 = 1"), idx, epoch=0)

    rep = check_pq_store(idx)
    assert rep["ok"] and rep["findings"] == []

    local = str(tmp_path / "pq")
    # orphaned compaction staging dir -> warn, still ok
    os.makedirs(f"{local}/codes.compact", exist_ok=True)
    rep = check_pq_store(idx)
    assert rep["ok"] and _codes(rep) == ["orphan_compaction_dir"]

    # torn ledger -> error (written through fsio: the Hadoop local FS
    # keeps .crc sidecars, so out-of-band edits would fail on checksum
    # rather than content — either way unreadable, but pin the parse)
    from quality_spark.sources import fsio

    fsio.write_text(fsio.join(idx, "epochs.json"), "{not json")
    rep = check_pq_store(idx)
    assert not rep["ok"] and "ledger_unreadable" in _codes(rep)
    fsio.write_json(fsio.join(idx, "epochs.json"), {"applied": [2, 1]})
    assert "ledger_disorder" in _codes(check_pq_store(idx))
    fsio.write_json(fsio.join(idx, "epochs.json"), {"applied": [0]})

    # pending sentinel -> error with the op named
    fsio.write_json(fsio.join(idx, "meta.json.pending"), {"op": "append"})
    rep = check_pq_store(idx)
    assert not rep["ok"] and "pending_sentinel" in _codes(rep)
    fsio.delete(fsio.join(idx, "meta.json.pending"))

    # data deleted out-of-band -> error
    import shutil

    shutil.rmtree(f"{local}/codes")
    rep = check_pq_store(idx)
    assert not rep["ok"] and "missing_table" in _codes(rep)

    # not a store at all
    rep = check_pq_store(f"file://{tmp_path}/nowhere")
    assert not rep["ok"] and "no_meta" in _codes(rep)


def test_doctor_bm25_store_states(spark, sf_dir, tmp_path):
    from quality_spark.llm.retrieval import write_bm25_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = str(tmp_path / "bm25")
    write_bm25_index(docs, idx, buckets=4)
    rep = check_bm25_store(idx)
    assert rep["ok"] and rep["findings"] == []
    os.makedirs(f"{idx}/tokens.old", exist_ok=True)
    rep = check_bm25_store(idx)
    assert rep["ok"] and _codes(rep) == ["orphan_compaction_dir"]


def test_doctor_neardup_store_states(spark, tmp_path):
    from quality_spark.streaming.recipes import (
        compact_neardup_store,
        neardup_to_store,
    )

    kw = dict(k=3, num_perm=16, bands=8, threshold=0.3)
    rows = [(i, " ".join(f"d{i}_{j}" for j in range(12))) for i in range(6)]
    b0 = spark.createDataFrame(rows[:3], "doc_id long, text string")
    b1 = spark.createDataFrame(rows[3:], "doc_id long, text string")
    store = str(tmp_path / "nd")

    rep = check_neardup_store(spark, store)
    assert rep["ok"] and _codes(rep) == ["empty_store"]

    h = neardup_to_store(store, **kw)
    h(b0, 0)
    h(b1, 1)
    rep = check_neardup_store(spark, store)
    assert rep["ok"] and _codes(rep) == ["summary"]

    # stale marker on a committed epoch -> warn with replay guidance
    os.makedirs(f"{store}/_inflight", exist_ok=True)
    with open(f"{store}/_inflight/epoch=1", "w"):
        pass
    rep = check_neardup_store(spark, store)
    assert rep["ok"] and "stale_inflight_marker" in _codes(rep)
    # pre-commit marker (unknown epoch) -> info only
    os.rename(f"{store}/_inflight/epoch=1", f"{store}/_inflight/epoch=9")
    rep = check_neardup_store(spark, store)
    assert rep["ok"] and "inflight_marker" in _codes(rep)
    os.remove(f"{store}/_inflight/epoch=9")

    # orphaned (uncommitted) epoch dir -> warn; compaction sweeps it
    os.makedirs(f"{store}/sigs/epoch=7/bb=0", exist_ok=True)
    rep = check_neardup_store(spark, store)
    assert rep["ok"] and "orphan_epoch_dir" in _codes(rep)
    compact_neardup_store(spark, store)
    rep = check_neardup_store(spark, store)
    assert rep["ok"] and _codes(rep) == ["summary"]

    # crashed-compaction sentinel -> error
    with open(f"{store}/compactions/_COMPACTING", "w"):
        pass
    rep = check_neardup_store(spark, store)
    assert not rep["ok"] and "compacting_sentinel" in _codes(rep)
    os.remove(f"{store}/compactions/_COMPACTING")

    # committed live dir deleted out-of-band -> error (data loss)
    import glob
    import shutil

    live_dir = sorted(glob.glob(f"{store}/idmap/epoch=*"))[0]
    shutil.rmtree(live_dir)
    rep = check_neardup_store(spark, store)
    assert not rep["ok"] and "missing_live_dir" in _codes(rep)


def test_doctor_ledger_wrong_type_is_a_finding_not_a_crash(spark, sf_dir, tmp_path):
    """Review r12: a hand-edited ledger whose 'applied' is not a list
    of ints must produce ledger_unreadable, not a TypeError out of the
    doctor."""
    from quality_spark.llm.retrieval import write_bm25_index
    from quality_spark.sources import fsio

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = str(tmp_path / "bm")
    write_bm25_index(docs.filter("doc_id % 4 = 0"), idx, buckets=4)
    for bad in (5, {"0": True}, [1, "x"]):
        fsio.write_json(fsio.join(idx, "epochs.json"), {"applied": bad})
        rep = check_bm25_store(idx)
        assert not rep["ok"] and "ledger_unreadable" in _codes(rep), bad


def test_doctor_key_store_states(spark, tmp_path):
    """VERDICT r12 next #4: every staged-swap state of the bucketed
    key store (`compact_key_store`'s sentinel protocol) classified by
    the doctor — mirroring `recover_key_store`'s decision table."""
    from quality_spark.doctor import check_key_store
    from quality_spark.streaming.recipes import (
        _compaction_paths,
        _sentinel_paths,
        _store_meta,
        compact_key_store,
        dedup_against_bucketed_store,
    )

    table = "qs_doctor_keystore"
    for t in (table, table + "__compacting"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    rep = check_key_store(spark, table)
    assert rep["ok"] and _codes(rep) == ["no_store"]

    loc = str(tmp_path / "ks")
    sunk = []
    h = dedup_against_bucketed_store(
        table, ["k"], lambda df, ep: sunk.append(df.count()),
        buckets=2, path=loc,
    )
    h(spark.createDataFrame([(i,) for i in range(8)], "k long"), 0)
    compact_key_store(spark, table)
    rep = check_key_store(spark, table)
    assert rep["ok"] and rep["findings"] == []

    meta = _store_meta(spark, table)
    stage_loc, old_loc = _compaction_paths(meta["Location"])
    ready_sent, oldok_sent = _sentinel_paths(meta["Location"])

    def _local(p):
        return p[len("file:"):] if p.startswith("file:") else p

    # crash after staging, before any rename: stage + __stage_ready
    os.makedirs(_local(stage_loc), exist_ok=True)
    open(_local(ready_sent), "w").close()
    rep = check_key_store(spark, table)
    assert not rep["ok"] and _codes(rep) == [
        "interrupted_compaction_stage_ready"
    ]
    os.remove(_local(ready_sent))
    # no sentinels, stage beside a live store -> warn only
    rep = check_key_store(spark, table)
    assert rep["ok"] and _codes(rep) == ["orphan_stage_dir"]
    os.rmdir(_local(stage_loc))

    # crash mid-swap: __old_complete + old dir -> error (store untrusted)
    os.makedirs(_local(old_loc), exist_ok=True)
    open(_local(oldok_sent), "w").close()
    rep = check_key_store(spark, table)
    assert not rep["ok"] and _codes(rep) == [
        "interrupted_compaction_old_complete"
    ]
    os.remove(_local(oldok_sent))
    # no sentinels, old beside a live store -> warn only
    rep = check_key_store(spark, table)
    assert rep["ok"] and _codes(rep) == ["orphan_old_dir"]

    # stray sentinels (no matching dir) -> warn only
    os.rmdir(_local(old_loc))
    open(_local(ready_sent), "w").close()
    assert _codes(check_key_store(spark, table)) == ["stray_stage_sentinel"]
    os.remove(_local(ready_sent))
    open(_local(oldok_sent), "w").close()
    assert _codes(check_key_store(spark, table)) == ["stray_old_sentinel"]
    os.remove(_local(oldok_sent))

    # store dir deleted out-of-band -> error (recoverable iff old/stage)
    import shutil

    os.makedirs(_local(old_loc), exist_ok=True)
    shutil.rmtree(_local(meta["Location"]))
    rep = check_key_store(spark, table)
    assert not rep["ok"] and _codes(rep) == ["store_dir_missing_recoverable"]
    os.rmdir(_local(old_loc))
    rep = check_key_store(spark, table)
    assert not rep["ok"] and _codes(rep) == ["store_dir_missing"]

    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_doctor_key_store_managed_states(spark):
    """Managed-store states: tmp table beside a live store (warn) and
    tmp without the store (error, recover renames it in)."""
    from quality_spark.doctor import check_key_store

    table = "qs_doctor_keystore_mgd"
    tmp = table + "__compacting"
    for t in (table, tmp):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.createDataFrame([(1,)], "k long").write.saveAsTable(table)
    spark.createDataFrame([(1,)], "k long").write.saveAsTable(tmp)
    rep = check_key_store(spark, table)
    assert rep["ok"] and _codes(rep) == ["orphan_compacting_table"]
    spark.sql(f"DROP TABLE {table}")
    rep = check_key_store(spark, table)
    assert not rep["ok"] and _codes(rep) == [
        "interrupted_managed_compaction"
    ]
    spark.sql(f"DROP TABLE {tmp}")


def test_doctor_bigbloom_store_states(spark, sf_dir, tmp_path):
    """Big-bloom layout checks: healthy store clean; URI root refused;
    missing/corrupt buckets are errors; out-of-range bucket files warn;
    the bucket probe reads npy HEADERS only (mmap), never the bits."""
    import numpy as np

    from quality_spark.doctor import check_bigbloom_store
    from quality_spark.sources.bigbloom import big_bloom_from

    root = str(tmp_path / "bb")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    big_bloom_from(orders, "o_custkey", expected=4000, root_dir=root,
                   fpp=0.01, buckets=4)
    rep = check_bigbloom_store(root)
    assert rep["ok"] and rep["findings"] == []

    assert _codes(check_bigbloom_store("s3a://bucket/bb")) == ["uri_root"]
    assert _codes(check_bigbloom_store(str(tmp_path / "nope"))) == [
        "no_meta"
    ]

    # out-of-range leftover -> warn, still ok
    np.save(f"{root}/bucket_9.npy", np.zeros(8, dtype=np.uint8))
    rep = check_bigbloom_store(root)
    assert rep["ok"] and _codes(rep) == ["extra_bucket"]
    os.remove(f"{root}/bucket_9.npy")

    # wrong shape -> error naming the bucket
    good = np.load(f"{root}/bucket_2.npy")
    np.save(f"{root}/bucket_2.npy", np.zeros(3, dtype=np.uint8))
    rep = check_bigbloom_store(root)
    assert not rep["ok"] and _codes(rep) == ["bucket_corrupt"]
    np.save(f"{root}/bucket_2.npy", good)

    # missing bucket -> error
    os.remove(f"{root}/bucket_1.npy")
    rep = check_bigbloom_store(root)
    assert not rep["ok"] and _codes(rep) == ["missing_bucket"]

    # torn meta -> error
    with open(f"{root}/meta.json", "w") as fh:
        fh.write("{not json")
    assert _codes(check_bigbloom_store(root)) == ["meta_unreadable"]
