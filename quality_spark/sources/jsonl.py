"""JSONL (newline-delimited JSON) corpus I/O.

Training-data pipelines overwhelmingly exchange document corpora as
JSONL shards; Spark's native json source IS line-delimited, so these
helpers only pin down the conventions that make round-trips faithful
at scale:

- ALWAYS pass an explicit schema on read: schema inference scans the
  whole input once before the real read — a full extra pass at 100 TB
  — and silently widens types.
- Writes go through ``ignoreNullFields=false`` so a null field
  round-trips as an explicit null instead of vanishing (schema drift
  across shards otherwise).
- Compression defaults to gzip — the interchange convention for JSONL
  shards — but gzip is NOT a splittable codec: each shard is read by a
  single task, so parallelism comes from writing MANY shards (the
  upstream partitioning), never from splitting one. For large shards
  where intra-file splits matter, write uncompressed text or use a
  splittable codec from the cluster's runtime; pass
  ``compression=None`` here for raw text.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: Optional[str] = "gzip",
) -> None:
    w = df.write.mode(mode).option("ignoreNullFields", "false")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: Union[str, T.StructType],
    mode: str = "FAILFAST",
) -> DataFrame:
    """Schema-first JSONL read; FAILFAST by default so corrupt shards
    surface instead of becoming silent nulls (pass mode='PERMISSIVE'
    plus a _corrupt_record column for salvage jobs)."""
    return spark.read.option("mode", mode).schema(schema).json(path)
