"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products run as JVM ``aggregate(zip_with(...))`` (no UDF); the
  query side is broadcast so the big side never shuffles.
- ``lsh_bucket_topk``: random-hyperplane LSH variant — the 100 TB path.
  Hyperplane weights are pseudo-random ±1 derived from xxhash64 of
  (plane, dim), so signatures are deterministic, need no model state,
  and compute JVM-side. Candidates meet only within a bucket
  (hash-partitioned join), then exact cosine re-ranks.
- ``embedding_near_dup_pairs``: cosine ≥ τ near-duplicate detection via
  the same LSH bucketing (used for embedding-based dedup).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def _norm(a: str) -> Column:
    return F.sqrt(_dot(a, a))


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "norm") -> DataFrame:
    return df.select("*", _norm(vec_col).alias(out))


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbors for each query row:
    (query_id, neighbor_id, cosine, rank). Norms are precomputed on
    both sides; the (small) query side broadcasts, so the corpus scan
    is a single pass with no shuffle until the per-query top-k."""
    corpus = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _norm(vec_col).alias("__cn"),
    )
    qs = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            _norm(vec_col).alias("__qn"),
        )
    )
    joined = corpus.crossJoin(qs)
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    cos = (_dot("__qv", "__cv") / (F.col("__qn") * F.col("__cn"))).alias("cosine")
    scored = joined.select("query_id", "neighbor_id", cos)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def signature_sql(
    vec: str, planes: int, seed: int, dialect: str = "spark", mode: str = "fast"
) -> str:
    """LSH bit-signature SQL: sign of projection onto pseudo-random ±1
    hyperplanes. ``fast`` derives weights from xxhash64(seed, plane,
    dim) — JVM-only; ``portable`` derives them from a 60-bit md5-prefix
    hash computable identically in DuckDB, so the correctness oracle
    can replay the bucketed pipeline (same twin-dialect trick as
    dedup.hash60_sql)."""
    from .dedup import hash60_sql

    bits = []
    for p in range(planes):
        if mode == "fast":
            if dialect != "spark":
                raise ValueError("fast mode is Spark-only (xxhash64)")
            w = (
                f"CASE WHEN (xxhash64('{seed}', '{p}', d) & 1) = 1 "
                f"THEN 1.0D ELSE -1.0D END"
            )
        elif dialect == "spark":
            key = f"concat('{seed}', ':', '{p}', ':', CAST(d AS STRING))"
            w = (
                f"CASE WHEN ({hash60_sql(key, 'spark')} & 1) = 1 "
                f"THEN 1.0D ELSE -1.0D END"
            )
        else:
            key = f"('{seed}' || ':' || '{p}' || ':' || CAST(i - 1 AS VARCHAR))"
            w = (
                f"CASE WHEN ({hash60_sql(key, 'duckdb')} & 1) = 1 "
                f"THEN 1.0 ELSE -1.0 END"
            )
        if dialect == "spark":
            proj = (
                f"aggregate(zip_with({vec}, sequence(0, size({vec}) - 1), "
                f"(v, d) -> CAST(v AS DOUBLE) * ({w})), 0.0D, (acc, x) -> acc + x)"
            )
            one = f"CAST({1 << p} AS BIGINT)"
        else:
            proj = (
                f"list_sum(list_transform(range(1, len({vec}) + 1), "
                f"i -> CAST({vec}[i] AS DOUBLE) * ({w})))"
            )
            one = f"CAST({1 << p} AS BIGINT)"
        bits.append(f"(CASE WHEN ({proj}) > 0 THEN {one} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def _signature(vec_col: str, planes: int, seed: int, mode: str = "fast") -> Column:
    return F.expr(signature_sql(vec_col, planes, seed, "spark", mode))


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    planes: int = 8,
    seed: int = 7,
    out: str = "lsh_bucket",
    mode: str = "fast",
) -> DataFrame:
    return df.select("*", _signature(vec_col, planes, seed, mode).alias(out))


def _with_lsh_tables(
    df: DataFrame, vec_col: str, planes: int, tables: int, seed: int,
    mode: str = "fast",
) -> DataFrame:
    """Multi-table SRP-LSH (OR-amplification): one signature per table;
    a pair is a candidate if ANY table agrees. Output exploded to
    (table_idx, sig) so the join shuffles on small keys."""
    sigs = F.array(
        *[_signature(vec_col, planes, seed + 1000 * t, mode) for t in range(tables)]
    )
    return df.select("*", F.posexplode(sigs).alias("table_idx", "sig"))


def lsh_bucket_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 4,
    tables: int = 8,
    seed: int = 7,
    mode: str = "fast",
) -> DataFrame:
    """Approximate top-k: candidates restricted to rows sharing an LSH
    bucket in ANY of the hash tables, then exact cosine re-rank. At
    scale, corpus and queries shuffle on (table, signature) — no cross
    join ever happens; tables×planes tunes the recall/cost point."""
    corpus = _with_lsh_tables(df, vec_col, planes, tables, seed, mode).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _norm(vec_col).alias("__cn"),
        "table_idx",
        "sig",
    )
    qs = _with_lsh_tables(queries, vec_col, planes, tables, seed, mode).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _norm(vec_col).alias("__qn"),
        "table_idx",
        "sig",
    )
    joined = (
        corpus.join(qs, ["table_idx", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = (_dot("__qv", "__cv") / (F.col("__qn") * F.col("__cn"))).alias("cosine")
    scored = joined.select("query_id", "neighbor_id", cos)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 4,
    tables: int = 8,
    seed: int = 7,
    mode: str = "fast",
) -> DataFrame:
    """(id_a, id_b, cosine ≥ threshold) within multi-table LSH buckets.
    High-cosine pairs collide in some table with probability
    1-(1-(1-θ/π)^planes)^tables; candidates verify with exact cosine,
    so there are no false positives — only the standard recall
    trade-off."""
    sig = _with_lsh_tables(df, vec_col, planes, tables, seed, mode).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), _norm(vec_col).alias("n"),
        "table_idx", "sig",
    )
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table_idx") == F.col("b.table_idx"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = (
        F.expr(
            "aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "0.0D, (acc, v) -> acc + v)"
        )
        / (F.col("na") * F.col("nb"))
    ).alias("cosine")
    return cand.select("id_a", "id_b", cos).filter(F.col("cosine") >= threshold)


def brute_force_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact O(n²) variant — oracle/baseline only; use the LSH variant
    at scale."""
    sig = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), _norm(vec_col).alias("n")
    )
    a, b = sig.alias("a"), sig.alias("b")
    cand = a.join(b, F.col("a.id") < F.col("b.id"))
    cos = (
        F.expr(
            "aggregate(zip_with(a.v, b.v, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "0.0D, (acc, v) -> acc + v)"
        )
        / (F.col("a.n") * F.col("b.n"))
    ).alias("cosine")
    return cand.select(
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), cos
    ).filter(F.col("cosine") >= threshold)
