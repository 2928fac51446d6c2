"""CSV ingestion with corrupt-row quarantine.

Real corpora arrive as CSV/TSV exports more often than anyone likes.
Two problems dominate at scale and both are handled here:

1. **Fidelity** — RFC 4180 quoting (quote doubling, not backslash
   escaping: ``escape='"'``) and ``multiLine`` parsing so embedded
   quotes, commas, and newlines round-trip byte-exactly (gate-proved
   with adversarial payloads).
2. **Bad rows** — a malformed row must neither kill the job
   (FAILFAST) nor silently vanish (DROPMALFORMED). PERMISSIVE mode
   with ``columnNameOfCorruptRecord`` routes every unparseable row,
   verbatim, to a QUARANTINE DataFrame the caller can persist and
   triage; the good rows flow on.

Scale note: ``multiLine=true`` makes each CSV file non-splittable
(the parser must see the whole file to pair quotes) — shard the
corpus into many files of executor-digestible size (the writer's
``repartition`` knob); with one 100 GB file the option would
serialize the read. When payloads provably contain no newlines, pass
``multi_line=False`` to restore intra-file split parallelism.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_csv", "read_csv_quarantined"]

_CORRUPT = "_corrupt_record"


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    compression: Optional[str] = None,
    num_shards: Optional[int] = None,
    sep: str = ",",
) -> None:
    """RFC 4180 writer: quote char ``"`` doubled via ``escape='"'``
    (Spark's default backslash escaping produces CSV most other
    readers mis-parse). ``num_shards`` controls file count — size
    shards so a multiLine reader still parallelizes. ``sep='\t'``
    writes TSV with the same quoting contract."""
    out = df.repartition(num_shards) if num_shards else df
    w = (
        out.write.mode(mode)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("quote", '"')
        .option("escape", '"')
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def read_csv_quarantined(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    multi_line: bool = True,
    persist: bool = False,
    sep: str = ",",
) -> Tuple[DataFrame, DataFrame]:
    """Returns ``(good, quarantine)``: good rows parsed against
    ``schema`` (a DDL string WITHOUT the corrupt column), quarantine
    rows as their verbatim source text plus the partially-parsed
    columns.

    ``persist=True`` caches the parsed scan — REQUIRED before any
    action that touches only the quarantine side (Spark's analyzer
    refuses corrupt-record-only projections over a raw CSV scan:
    QUERY_ONLY_CORRUPT_RECORD_COLUMN). Sized for triage runs; at
    100 TB don't cache — write ``good``/``quarantine`` to storage in
    one pass instead (each write references data columns, which the
    analyzer accepts)."""
    full = (
        spark.read.schema(f"{schema}, {_CORRUPT} string")
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", str(multi_line).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .csv(path)
    )
    if persist:
        full = full.cache()
    # Spark disallows plans whose referenced columns are ONLY the
    # corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    # quarantine frame therefore keeps the partially-parsed columns
    # alongside the verbatim record (they're what triage wants anyway)
    good = full.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = full.filter(F.col(_CORRUPT).isNotNull()).withColumnRenamed(
        _CORRUPT, "raw_record"
    )
    return good, bad
