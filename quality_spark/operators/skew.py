"""Skew-mitigation operators: salted aggregation and replicated skew
join.

AQE's skew-join splitting handles most cases automatically (enable
``spark.sql.adaptive.enabled`` in your session — the library never
overrides session conf, but the repo's own bench/test sessions set it);
these are the explicit tools for the two patterns AQE does not cover:

- ``salted_agg``: a hot grouping key overloads one reducer even with
  AQE (a single group cannot be split). Salting splits each key into
  ``salt_n`` sub-groups for the partial aggregate, then merges the
  partials — two small shuffles instead of one hot one. Restricted to
  algebraic aggregates (sum/count/min/max + avg via sum/count) because
  only those merge losslessly across partials.
- ``replicated_skew_join``: a hot join key floods one task. The big
  side takes a seeded-rand per-row salt (identical duplicate rows — the
  canonical hot key — would all share a row hash and defeat a
  hash-based salt); the small side replicates ``salt_n`` times so every
  salt value joins correctly regardless of routing; the join key
  becomes (key, salt), spreading the hot key over ``salt_n`` tasks at
  the cost of ``|small| x salt_n`` replication.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregate name -> (partial fn, merge fn)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Dict[str, Sequence[str]],
    salt_n: int = 16,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) partials, then
    groupBy(keys) merge. ``aggs`` maps output column -> (fn, input)
    with fn in sum/count/min/max/avg.

    Output column names match a plain ``groupBy(keys).agg(...)`` so the
    two are drop-in interchangeable (pinned by tests)."""
    if salt_n < 1:
        raise ValueError("salt_n must be >= 1")
    # rand-based, NOT row-hash: the canonical hot group is millions of
    # IDENTICAL rows, which all share one row-hash and would defeat the
    # salt. Any row->salt assignment merges correctly for algebraic
    # aggregates, so randomness is safe here (unlike the join variant,
    # where routing must be deterministic per row).
    salt = F.floor(F.rand(87) * salt_n).cast("int").alias("__salt")

    partials, merges = [], []
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            partials += [
                F.sum(col).alias(f"__p_{out}_s"),
                F.count(col).alias(f"__p_{out}_c"),
            ]
            merges.append(
                (F.sum(f"__p_{out}_s") / F.sum(f"__p_{out}_c")).alias(out)
            )
            continue
        if fn not in _ALGEBRAIC:
            raise ValueError(
                f"salted_agg supports {sorted(_ALGEBRAIC)} + avg, got {fn!r} "
                f"(holistic aggregates like median cannot merge from partials)"
            )
        pf, mf = _ALGEBRAIC[fn]
        partials.append(pf(col).alias(f"__p_{out}"))
        merges.append(mf(f"__p_{out}").alias(out))

    partial = df.select("*", salt).groupBy(*keys, "__salt").agg(*partials)
    return partial.groupBy(*keys).agg(*merges)


def replicated_skew_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys: big rows salt into
    ``salt_n`` buckets, ``small`` replicates to every bucket, and the
    join runs on (keys..., salt). Result equals
    ``big.join(small, keys, how)`` row-for-row regardless of salt
    assignment (pinned by tests and the driver gate)."""
    if salt_n < 1:
        raise ValueError("salt_n must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError("replicated_skew_join supports inner/left joins")
    keys = list(keys)
    # seeded-rand salt, not row-hash: identical duplicate rows (the
    # canonical hot key) all share one hash and would stay on one task;
    # rand spreads them. Any salt value joins correctly (the small side
    # carries every salt), so per-row routing freedom is safe. Bonus:
    # row-hash breaks on map-typed columns (hash of MapType is
    # disallowed); rand does not.
    b = big.select(
        "*",
        F.floor(F.rand(53) * salt_n).cast("int").alias("__salt"),
    )
    s = small.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(salt_n)])).alias("__salt")
    )
    return b.join(s, keys + ["__salt"], how).drop("__salt")
