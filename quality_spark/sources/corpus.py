"""Partitioned corpus store: the standard curated-training-data layout
(`.../lang=en/source=web/part-*.parquet`).

Hive-style partition columns give free partition PRUNING — a reader
filtering `lang = 'en'` lists and scans only that directory subtree
(PartitionFilters in the scan, pinned by test), which at 100 TB is the
difference between touching 2 % of the corpus and all of it.

Write-side discipline for scale:
- partition columns must be LOW cardinality (lang, source, date —
  never doc ids): each task writes one file per distinct partition
  value it holds, so high cardinality explodes small files;
- repartition by the partition columns first (one shuffle) so each
  output partition is written by few tasks — without it every task
  writes every partition value it sees (tasks × partitions files).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_partitioned_corpus",
    "read_partitioned_corpus",
    "write_bucketed_corpus",
    "bucketed_join",
]


def write_partitioned_corpus(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("lang",),
    mode: str = "overwrite",
    coalesce_shuffle: bool = True,
) -> None:
    out = df
    if coalesce_shuffle:
        out = df.repartition(*[F.col(c) for c in partition_cols])
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned_corpus(
    spark: SparkSession,
    path: str,
    where: Optional[str] = None,
) -> DataFrame:
    """Read back; a ``where`` over partition columns prunes directories
    before any data file is opened."""
    df = spark.read.parquet(path)
    return df.filter(where) if where else df


def write_bucketed_corpus(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] = (),
    path: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Write as a BUCKETED catalog table: rows are hash-distributed
    into ``num_buckets`` files per partition by Murmur3 on
    ``bucket_cols``, and the bucket spec is recorded in the catalog.

    Why this matters at 100 TB: two tables bucketed the same way on the
    join key sort-merge-join with NO Exchange on either side (pinned by
    plan test) — the single biggest shuffle eliminated in a pipeline
    that repeatedly joins docs ⋈ scores ⋈ dedup-verdicts on doc id.
    Same for groupBy on the bucket key: aggregation runs bucket-local.

    Write discipline: we ``repartition(num_buckets, bucket_cols)``
    first — Spark's repartition and bucketing use the SAME Murmur3 hash
    mod num_buckets, so every task then holds exactly one bucket's rows
    and writes ONE file (without it each task can emit up to
    num_buckets small files: tasks × buckets file explosion).

    ``path`` makes it an external table (shared object storage at
    scale); omitted, the session warehouse holds the data.
    """
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    out = df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
    writer = (
        out.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    if sort_cols:
        # sortBy gives sorted bucket FILES -> SMJ skips its sort too
        writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed catalog tables on (a superset of)
    their bucket columns. With both sides bucketed n-ways on the join
    key this plans as an Exchange-free sort-merge join — the scan
    output IS the required hash distribution, so the only work is the
    per-bucket merge. The plan pin lives in
    ``tests/test_plans.py::test_bucketed_join_no_exchange``."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
