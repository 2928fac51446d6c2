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
