"""Compression-ratio quality signal.

A document's zlib ratio (compressed bytes / raw bytes) is a cheap,
language-agnostic repetitiveness measure used by public corpus
pipelines (Gopher's quality heuristics, Dolma's dedup diagnostics):
boilerplate-heavy or template-generated text compresses far below
natural prose, near-random byte soup compresses above 1.0 (header
overhead). Typical curation keeps documents inside a band (e.g.
0.25–1.0).

Scale design: one Arrow-batched ``pandas_udf`` over the text column —
pure projection, no shuffle, streaming-safe; zlib is C-speed, so the
scan stays I/O-bound. There is no SQL twin (DuckDB has no zlib
surface), so the driver gate for this operator pins an INVARIANT the
oracle can state — text repeated 8× must compress to under 0.9× the
single-copy ratio — rather than raw ratios; exact ratio values are
pinned in tests against stdlib zlib directly.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["compression_ratio", "with_compression_ratio"]


def compression_ratio(text: str, level: int = 6, repeats: int = 1) -> float:
    """Pure-Python single-doc ratio (the UDF applies this per batch
    row; exposed for tests/sparkless use). ``repeats`` measures the
    ratio of the text concatenated N times — the repeated-text ratio
    is the self-similarity probe (a doc that is its own best
    dictionary barely grows when repeated)."""
    b = (text or "").encode("utf-8") * repeats
    if not b:
        return None  # type: ignore[return-value]
    return len(zlib.compress(b, level)) / len(b)


def with_compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out: str = "zlib_ratio",
    level: int = 6,
    repeats: int = 1,
) -> DataFrame:
    """Adds the zlib ratio column (double; NULL for NULL/empty
    text)."""

    @pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: None if x is None else compression_ratio(x, level, repeats)
        )

    return df.withColumn(out, _ratio(F.col(text_col)))
