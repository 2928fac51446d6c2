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
