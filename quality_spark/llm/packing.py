"""Context-length preparation for LLM training: document chunking and
sequence packing.

- :func:`chunk_documents` splits long documents into overlapping
  token-window chunks (the standard pretraining chunking step) — a
  pure JVM projection + explode, no shuffle, streaming-safe.
- :func:`pack_sequences` assigns documents to fixed-token-budget
  training bins by sequential fill (each bin may overflow by at most
  its last document — the classic streaming-concat packing used when
  documents are concatenated with separators and split every
  ``budget`` tokens).

Scale design for packing: a single global ordering window would pull
the corpus into ONE partition — a scale killer. Packing therefore runs
per SHARD (``doc_id % n_shards``): each shard fills its own bins
independently (one hash shuffle, windows sort within shards), and bin
ids are globally unique via ``shard * 2^40 + local_bin``. This matches
real pipelines, which pack within output files, not globally. The
DuckDB oracle replays the same arithmetic bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens_sql

_SHARD_SHIFT = 40


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode each document into chunks of ``max_tokens`` whitespace
    tokens with ``overlap`` tokens carried between consecutive chunks.
    Chunk starts advance by ``max_tokens - overlap``; the final chunk
    may be short; an empty document yields one empty chunk."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("require 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    staged = df.select(
        F.col(id_col), F.expr(tokens_sql(text_col, "spark")).alias("_toks")
    )
    n_chunks = f"greatest(CAST(ceil((size(_toks) - {overlap}) / {stride}) AS INT), 1)"
    return staged.select(
        id_col,
        F.expr(
            f"posexplode(transform(sequence(0, {n_chunks} - 1), "
            f"i -> slice(_toks, i * {stride} + 1, {max_tokens})))"
        ).alias("chunk_idx", "_chunk"),
    ).select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join("_chunk", " ").alias("chunk_text"),
        F.size("_chunk").cast("int").alias("chunk_tokens"),
    )


def chunk_documents_oracle_sql(
    max_tokens: int,
    overlap: int = 0,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`chunk_documents`."""
    stride = max_tokens - overlap
    return f"""
WITH toks AS (
  SELECT {id_col}, {tokens_sql('text', 'duckdb')} AS t
  FROM {table}
), n AS (
  SELECT {id_col}, t,
         greatest(CAST(ceil((len(t) - {overlap}) / {stride}.0) AS INT), 1) AS nc
  FROM toks
)
SELECT {id_col},
       CAST(i AS INT) AS chunk_idx,
       array_to_string(t[i * {stride} + 1 : i * {stride} + {max_tokens}], ' ')
         AS chunk_text,
       CAST(len(t[i * {stride} + 1 : i * {stride} + {max_tokens}]) AS INT)
         AS chunk_tokens
FROM n, unnest(range(0, nc)) AS u(i)
"""


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_shards: int = 256,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
) -> DataFrame:
    """Sequential-fill packing: within each shard, documents (ordered
    by id for determinism) accumulate until the running token total
    crosses ``budget``, then a new bin starts. Returns
    (id, shard, bin_id, bin_pos) — ``bin_id`` globally unique."""
    shard = (F.col(id_col) % n_shards).cast("long")
    w = Window.partitionBy("shard").orderBy(id_col)
    cum = F.sum(token_count_col).over(w)
    local_bin = F.floor((cum - F.col(token_count_col)) / F.lit(budget)).cast("long")
    out = df.select(id_col, token_count_col, shard.alias("shard")).select(
        id_col,
        token_count_col,
        "shard",
        ((F.col("shard") * (1 << _SHARD_SHIFT)) + local_bin).alias("bin_id"),
    )
    wb = Window.partitionBy("bin_id").orderBy(id_col)
    return out.select(
        id_col,
        token_count_col,
        "shard",
        "bin_id",
        (F.row_number().over(wb) - 1).cast("int").alias("bin_pos"),
    )


def pack_sequences_oracle_sql(
    budget: int,
    n_shards: int = 256,
    table_sql: str = "SELECT doc_id, n_tokens FROM documents",
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
) -> str:
    """DuckDB twin of :func:`pack_sequences` over any (id, n_tokens)
    relation."""
    return f"""
WITH base AS ({table_sql}),
sh AS (
  SELECT {id_col}, {token_count_col},
         CAST({id_col} % {n_shards} AS BIGINT) AS shard
  FROM base
), cum AS (
  SELECT *,
         CAST(floor((sum({token_count_col}) OVER (
             PARTITION BY shard ORDER BY {id_col}) - {token_count_col})
           / {budget}.0) AS BIGINT) AS local_bin
  FROM sh
)
SELECT {id_col}, {token_count_col}, shard,
       shard * {1 << _SHARD_SHIFT} + local_bin AS bin_id,
       CAST(row_number() OVER (
           PARTITION BY shard * {1 << _SHARD_SHIFT} + local_bin
           ORDER BY {id_col}) - 1 AS INT) AS bin_pos
FROM cum
"""
