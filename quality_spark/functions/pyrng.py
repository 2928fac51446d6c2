"""Seeded RNG algorithm families as counter-mode Philox pandas UDFs.

Reference semantics (impl/rng/RngExpression.scala:12-141,
RuleRegistrationFunctions.scala:346-376): ``rng('ALGO'[, seed])``
selects a commons-rng RandomSource; jumpable sources branch a
per-partition stream.  Two honesty notes, both load-bearing:

- The algorithm NAME is honored as a distinct, stable stream family —
  same (algo, seed, partition, row) always yields the same value, and
  different algos yield unrelated streams.  Bit-parity with
  commons-rng is NOT provided (and is not well-defined to begin with:
  the reference seeds each fresh stream from ``source.createSeed()``,
  a random value — impl/rng/RngImpl.scala:43 — so even two reference
  runs disagree).
- Every family is backed by numpy's Philox in counter mode, keyed by
  (algo-id, seed) and jumped per Spark partition.  Philox is the one
  numpy BitGenerator whose O(1) ``advance`` lets a row address its
  draws by position (counter = row index in partition, via
  ``monotonically_increasing_id``), which keeps the UDF a pure
  function of its inputs — reproducible under retries and stage
  re-execution, which no stateful RNG UDF can promise on Spark.

Scale: the UDF is Arrow-batched; each batch does one Philox
``random_raw`` per contiguous row-run (normally 1 per batch).
Reproducibility caveat (same as Spark's ``rand(seed)``): values are a
function of (partition, row-position), so they are stable across runs
only for the same partitioning and row order.
"""

from __future__ import annotations

import weakref
from typing import Tuple

import numpy as np
import pandas as pd

#: commons-rng RandomSource names (public enum) -> stable stream ids.
#: The id feeds the Philox key, so renumbering would change streams —
#: append only.
SUPPORTED_RNG_ALGOS = {
    name: i
    for i, name in enumerate(
        [
            "XO_RO_SHI_RO_128_PP",
            "XO_RO_SHI_RO_128_PLUS",
            "XO_RO_SHI_RO_128_SS",
            "XO_SHI_RO_128_PP",
            "XO_SHI_RO_128_PLUS",
            "XO_SHI_RO_128_SS",
            "XO_SHI_RO_256_PP",
            "XO_SHI_RO_256_PLUS",
            "XO_SHI_RO_256_SS",
            "XO_SHI_RO_512_PP",
            "XO_SHI_RO_512_PLUS",
            "XO_SHI_RO_512_SS",
            "XO_RO_SHI_RO_64_S",
            "XO_RO_SHI_RO_64_SS",
            "XO_RO_SHI_RO_1024_PP",
            "XO_RO_SHI_RO_1024_S",
            "XO_RO_SHI_RO_1024_SS",
            "SPLIT_MIX_64",
            "PCG_XSH_RR_32",
            "PCG_XSH_RS_32",
            "PCG_RXS_M_XS_64",
            "PCG_MCG_XSH_RR_32",
            "PCG_MCG_XSH_RS_32",
            "MT",
            "MT_64",
            "WELL_512_A",
            "WELL_1024_A",
            "WELL_19937_A",
            "WELL_19937_C",
            "WELL_44497_A",
            "WELL_44497_B",
            "JDK",
            "ISAAC",
            "KISS",
            "MWC_256",
            "XOR_SHIFT_1024_S",
            "XOR_SHIFT_1024_S_PHI",
            "TWO_CMRES",
            "JSF_32",
            "JSF_64",
            "SFC_32",
            "SFC_64",
            "MSWS",
        ]
    )
}

_POS_BITS = 33  # monotonically_increasing_id: (partition << 33) | row
_POS_MASK = (1 << _POS_BITS) - 1
_WORDS_PER_COUNTER = 4  # Philox4x64 emits 4 uint64 per counter step


def rng_algo_id(algo: str) -> int:
    a = algo.upper()
    if a not in SUPPORTED_RNG_ALGOS:
        raise ValueError(
            f"rng algorithm {algo!r} is not a known commons-rng "
            f"RandomSource; supported: {sorted(SUPPORTED_RNG_ALGOS)}"
        )
    return SUPPORTED_RNG_ALGOS[a]


def rng_draws(algo_id: int, seed: int, mids: np.ndarray, nwords: int) -> np.ndarray:
    """uint64 draws (len(mids), nwords), row-addressable: row i's words
    depend only on (algo_id, seed, mids[i])."""
    from numpy.random import Philox

    n = len(mids)
    cpr = -(-nwords // _WORDS_PER_COUNTER)  # counters per row
    out = np.empty((n, cpr * _WORDS_PER_COUNTER), np.uint64)
    if n == 0:
        return out[:, :nwords]
    key = ((algo_id & 0xFFFFFFFFFFFFFFFF) << 64) | (seed & 0xFFFFFFFFFFFFFFFF)
    pid = np.asarray(mids) >> _POS_BITS
    pos = np.asarray(mids) & _POS_MASK
    start = 0
    for i in range(1, n + 1):
        if i == n or pid[i] != pid[i - 1] or pos[i] != pos[i - 1] + 1:
            p, base, cnt = int(pid[start]), int(pos[start]), i - start
            bg = Philox(key=key)
            if p:
                bg = bg.jumped(p)  # independent per-partition stream
            bg.advance(base * cpr)  # counter-addressed: O(1) skip
            out[start:i] = bg.random_raw(cnt * cpr * _WORDS_PER_COUNTER).reshape(
                cnt, cpr * _WORDS_PER_COUNTER
            )
            start = i
    return out[:, :nwords]


def rng_pair(algo_id: int, seed: int, mids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    d = rng_draws(algo_id, seed, mids, 2)
    return d[:, 0].view(np.int64), d[:, 1].view(np.int64)


_registered: "weakref.WeakSet" = weakref.WeakSet()


def register_python_rng(spark) -> None:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<lower: bigint, higher: bigint>")
    def qs_rng_pair(algo: pd.Series, seed: pd.Series, mid: pd.Series) -> pd.DataFrame:
        if len(mid) == 0:
            return pd.DataFrame({"lower": [], "higher": []}, dtype="int64")
        lo, hi = rng_pair(int(algo.iloc[0]), int(seed.iloc[0]), mid.to_numpy())
        return pd.DataFrame({"lower": lo, "higher": hi})

    @pandas_udf("binary")
    def qs_rng_bytes(
        algo: pd.Series, seed: pd.Series, nbytes: pd.Series, mid: pd.Series
    ) -> pd.Series:
        if len(mid) == 0:
            return pd.Series([], dtype=object)
        nb = int(nbytes.iloc[0])
        nwords = -(-nb // 8)
        d = rng_draws(int(algo.iloc[0]), int(seed.iloc[0]), mid.to_numpy(), nwords)
        raw = d.astype("<u8").tobytes()
        stride = nwords * 8
        return pd.Series(
            [raw[i * stride : i * stride + nb] for i in range(len(mid))],
            dtype=object,
        )

    spark.udf.register("qs_rng_pair", qs_rng_pair)
    spark.udf.register("qs_rng_bytes", qs_rng_bytes)


def ensure_python_rng(spark=None) -> None:
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "seeded rng('ALGO', …) needs an active SparkSession at rule "
            "compile time (to register its pandas UDF)"
        )
    if spark in _registered:
        return
    register_python_rng(spark)
    _registered.add(spark)
