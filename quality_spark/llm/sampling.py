"""Deterministic sampling & dataset-mixing operators (training-data
pipeline: hold-out splits, per-language rebalancing, corpus mixing).

All sampling decisions are pure functions of (seed, key): the same row
lands on the same side of every split on every run, on any cluster, at
any partitioning — unlike ``df.sample``, whose output depends on
partition layout. Decisions are Column expressions over the portable
60-bit md5 hash (``dedup.hash60_sql``), so a DuckDB oracle can replay
them and a resumed/backfilled pipeline never flip-flops membership.

Scale: a sample/split/mix is a narrow per-row filter — no shuffle, no
state; mixing is a union of filtered scans, which Spark plans as
independent branches.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import hash60_sql

_DENOM = 1_000_000


def sample_cond_sql(
    key_sql: str, rate: float, seed: int, dialect: str = "spark",
    complement: bool = False,
) -> str:
    """Boolean SQL: keep iff hash60("{seed}:"||key) % 1e6 < rate*1e6
    (``complement=True`` keeps exactly the rows the plain form drops).

    NULL keys hash as the literal string '<NULL>' rather than making
    the whole condition NULL — otherwise every NULL-key row would be
    silently dropped from BOTH sides of a split, even at rate=1.0."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if dialect == "spark":
        key = (
            f"concat('{seed}', ':', "
            f"coalesce(CAST(({key_sql}) AS STRING), '<NULL>'))"
        )
    else:
        key = (
            f"('{seed}' || ':' || "
            f"coalesce(CAST(({key_sql}) AS VARCHAR), '<NULL>'))"
        )
    h = hash60_sql(key, dialect, "portable")
    cut = int(round(rate * _DENOM))
    op = ">=" if complement else "<"
    return f"(({h}) % {_DENOM}) {op} {cut}"


def hash_sample(
    df: DataFrame, rate: float, key_col: str, seed: int = 0,
    complement: bool = False,
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction keyed by ``key_col``.

    Train/test splits: ``train = hash_sample(df, 0.9, k)`` and
    ``test = hash_sample(df, 0.9, k, complement=True)`` — the
    complement keeps EXACTLY the rows the plain call drops. (Two
    plain calls at rates r and 1-r do NOT complement each other: both
    keep prefix intervals of the same hash, so the smaller is a
    subset of the larger.) Disjoint seeds give independent samples."""
    return df.filter(
        F.expr(sample_cond_sql(key_col, rate, seed, "spark", complement))
    )


def stratified_hash_sample(
    df: DataFrame,
    rates: Dict[str, float],
    strata_col: str,
    key_col: str,
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. language rebalancing:
    downsample en, keep all low-resource langs). Strata not listed get
    ``default_rate``."""
    branches = " ".join(
        f"WHEN CAST({strata_col} AS STRING) = {_str_lit(s)} "
        f"THEN ({sample_cond_sql(key_col, r, seed, 'spark')})"
        for s, r in sorted(rates.items())
    )
    cond = (
        f"CASE {branches} "
        f"ELSE ({sample_cond_sql(key_col, default_rate, seed, 'spark')}) END"
    )
    return df.filter(F.expr(cond))


def weighted_mix(
    sources: Sequence[Tuple[str, DataFrame, float]],
    key_col: str,
    seed: int = 0,
    source_col: str = "mix_source",
) -> DataFrame:
    """Mix corpora at per-source sampling rates (<= 1.0; upsampling is
    epoch repetition, out of scope for a single pass), tagging each row
    with its source name. Planned as a union of independently filtered
    scans — each branch pushes its own filter down."""
    parts = []
    for name, df, rate in sources:
        parts.append(
            hash_sample(df, rate, key_col, seed=seed).select(
                F.lit(name).alias(source_col), "*"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def temperature_rates(
    counts: Dict[str, int], temperature: float = 2.0
) -> Dict[str, float]:
    """Per-domain keep rates for TEMPERATURE resampling (the
    multilingual rebalance of mT5/XLM-R — public method): observed
    shares p_d = n_d/N are flattened to q_d ∝ p_d^(1/T); the returned
    rates realize the LARGEST corpus achieving the exact tempered
    mixture with no upsampling — r_d = C·q_d/n_d with
    C = min_d n_d/q_d, so the scarcest (post-flattening) domain keeps
    everything (rate exactly 1.0) and every other domain downsamples
    to match. T=1 reproduces the corpus as-is; T→∞ equalizes domains.

    Determinism note: p^(1/T) goes through pow(); at T=2 the
    implementation uses sqrt(), which is CORRECTLY ROUNDED in IEEE —
    a SQL oracle computing `sqrt(n)` reproduces the rates bit-for-bit
    (pow() is not correctly rounded everywhere, so cross-engine
    replays should prefer T=2 or precomputed rates)."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if not counts:
        return {}
    if temperature == 2.0:
        q = {d: float(n) ** 0.5 for d, n in counts.items()}
    else:
        q = {d: float(n) ** (1.0 / temperature) for d, n in counts.items()}
    c = min(n / q[d] for d, n in counts.items())
    return {d: min(1.0, c * q[d] / counts[d]) for d in counts}


def temperature_sample(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    temperature: float = 2.0,
    seed: int = 0,
    counts: Optional[Dict[str, int]] = None,
) -> DataFrame:
    """Deterministic temperature resampling in one pass: compute the
    per-domain rates from observed counts (one metadata-sized
    groupBy().count() collect — |domains| rows, the only driver-side
    step; pass ``counts`` to skip it) and apply them with the same
    hash-threshold filter as every other sampler here — a narrow
    per-row filter, no shuffle, replayable by the DuckDB oracle."""
    if counts is None:
        counts = {
            str(r[0]): r[1]
            for r in df.groupBy(domain_col).count().collect()
            if r[0] is not None
        }
    rates = temperature_rates(counts, temperature)
    return stratified_hash_sample(
        df, rates, domain_col, key_col, seed=seed, default_rate=0.0
    )


def _str_lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    score_col: str,
    id_col: str = "doc_id",
    salted: bool = False,
) -> DataFrame:
    """Keep at most ``cap`` rows per group — the crawl-curation
    "per-domain cap" (a handful of hosts dominate any web crawl; caps
    bound their share of the training mix). Keeps the top-``cap`` by
    (``score_col`` DESC, ``id_col`` ASC) so the result is deterministic
    and oracle-replayable.

    Plan: one window (shuffle on ``group_col``) with ``row_number`` —
    rank ≤ cap. With ``salted=True``, the skew-proof two-phase shape:
    phase 1 windows over (group, spark_partition_id) — the physical
    partition id acts as a free salt, so a mega-group (30%-of-corpus
    domain) is ranked in parallel slices, each keeping its local
    top-``cap`` — phase 2 re-ranks the ≤ cap × n_partitions survivors
    per group. Two shuffles, but no task ever sorts more than
    (group rows / n_partitions) + survivors; use it when a single
    group may exceed one executor's sort budget. Results are
    IDENTICAL: phase 1 can never evict a global top-``cap`` row
    because a row's global rank is ≥ its rank within any slice.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    if not salted:
        return (
            df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= cap)
            .drop("_rk")
        )
    w1 = Window.partitionBy(group_col, "_salt").orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    local = (
        df.withColumn("_salt", F.spark_partition_id())
        .withColumn("_rk", F.row_number().over(w1))
        .filter(F.col("_rk") <= cap)
        .drop("_rk", "_salt")
    )
    return (
        local.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )


def cap_per_group_oracle_sql(
    table: str, group_col: str, cap: int, score_col: str,
    id_col: str = "doc_id",
) -> str:
    """DuckDB replay of :func:`cap_per_group` (either variant — the
    salted shape is result-identical by construction)."""
    return f"""
SELECT * EXCLUDE (_rk) FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {group_col}
    ORDER BY {score_col} DESC, {id_col}
  ) AS _rk
  FROM {table}
) WHERE _rk <= {cap}
"""


def _es_score_sql(
    key_sql: str, weight_sql: str, seed: int, dialect: str
) -> str:
    """Efraimidis-Spirakis exponential-race score: -ln(u)/w with u a
    deterministic uniform in (0,1) from the portable 60-bit hash
    (never exactly 0 or 1 — the +0.5 centers the million buckets).
    Smaller score = earlier finisher = sampled first. Identical
    expression tree in both engines; ln agrees bit-for-bit on
    identical doubles (same empirically-pinned property the BM25 idf
    gate relies on)."""
    if dialect == "spark":
        key = (
            f"concat('{seed}', ':', "
            f"coalesce(CAST(({key_sql}) AS STRING), '<NULL>'))"
        )
    else:
        key = (
            f"('{seed}' || ':' || "
            f"coalesce(CAST(({key_sql}) AS VARCHAR), '<NULL>'))"
        )
    h = hash60_sql(key, dialect, "portable")
    u = f"((CAST(({h}) % {_DENOM} AS DOUBLE) + 0.5) / {_DENOM}.0)"
    return f"(-ln({u}) / CAST(({weight_sql}) AS DOUBLE))"


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — exactly
    ``n`` rows (fewer only if fewer qualify), inclusion odds
    proportional to ``weight_col``: the Efraimidis & Spirakis 2006
    one-pass reservoir order (public: "Weighted random sampling with
    a reservoir", IPL) rephrased declaratively. Each row gets an
    exponential race time -ln(u)/w from a seeded per-key uniform;
    the n smallest win — provably equivalent to sequential weighted
    draws without replacement.

    Rows with NULL or non-positive weight never qualify. One narrow
    projection + a TakeOrdered top-n (k rows per partition merge —
    no global sort, no full shuffle); the mix-building counterpart to
    ``hash_sample``'s fixed-rate cut. Deterministic in (seed, keys,
    weights), so the DuckDB oracle replays the exact sample; emitted
    ``sample_rank`` is the race order (the first ``m <= n`` rows ARE
    the size-m sample — nested samples for free)."""
    from pyspark.sql import Window

    score = F.expr(_es_score_sql(key_col, weight_col, seed, "spark"))
    eligible = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("__es", score)
    top = eligible.orderBy(F.col("__es"), F.col(key_col)).limit(int(n))
    w = Window.orderBy(F.col("__es"), F.col(key_col))
    return (
        top.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .drop("__es")
    )


def weighted_sample_oracle_sql(
    table: str,
    weight_col: str,
    n: int,
    key_col: str = "doc_id",
    seed: int = 0,
    columns: str = "*",
) -> str:
    """DuckDB replay of :func:`weighted_sample`."""
    score = _es_score_sql(key_col, weight_col, seed, "duckdb")
    return f"""
SELECT {columns}, CAST(rnk AS INT) AS sample_rank FROM (
  SELECT *, row_number() OVER (ORDER BY {score}, {key_col}) AS rnk
  FROM {table}
  WHERE {weight_col} IS NOT NULL AND {weight_col} > 0
) WHERE rnk <= {int(n)}
"""


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    n: int,
    key_col: str = "doc_id",
    seed: int = 0,
    salted: bool = False,
) -> DataFrame:
    """Weighted sampling without replacement WITHIN each group —
    "n docs per language, odds by quality score": the same
    Efraimidis-Spirakis race as :func:`weighted_sample`, cut per
    group. Implemented as a composition over :func:`cap_per_group`
    (negated race time, descending), so the skew-proof
    ``salted=True`` two-phase shape and its result-identity proof
    carry over unchanged. Rows with NULL/non-positive weight never
    qualify."""
    score = F.expr(_es_score_sql(key_col, weight_col, seed, "spark"))
    eligible = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("__es_neg", -score)
    return cap_per_group(
        eligible, group_col, int(n), "__es_neg", key_col, salted=salted
    ).drop("__es_neg")


def weighted_sample_per_group_oracle_sql(
    table: str,
    group_col: str,
    weight_col: str,
    n: int,
    key_col: str = "doc_id",
    seed: int = 0,
    columns: str = "*",
) -> str:
    """DuckDB replay of :func:`weighted_sample_per_group`."""
    score = _es_score_sql(key_col, weight_col, seed, "duckdb")
    return f"""
SELECT {columns} FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {group_col} ORDER BY {score}, {key_col}
  ) AS _rk
  FROM {table}
  WHERE {weight_col} IS NOT NULL AND {weight_col} > 0
) WHERE _rk <= {int(n)}
"""
