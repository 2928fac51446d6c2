"""Byte-pair-encoding tokenizer — train + apply, Spark-first.

Beyond-reference LLM-pipeline surface (SURVEY §7 phase 9): THE
tokenizer family of modern LLM pipelines, per the public algorithm of
Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units") with the GPT-2-style rank-greedy apply.

Scale design — the two halves have very different data sizes, and the
split exploits that:

- ``word_frequencies`` is the corpus-sized work: one explode + one
  groupBy shuffle with map-side combine (Zipf skew is absorbed by the
  partial aggregation, same argument as vocab_stats).
- ``train_bpe`` collects only the CAPPED word-frequency table
  (distinct words, not the corpus — bounded by ``max_vocab_words``
  highest-frequency words) and runs the classic merge loop in plain
  Python on the driver. This is the standard architecture: even at
  100 TB of text the useful distinct-word table is millions of rows,
  and per-iteration distributed pair-counting jobs would pay a full
  job latency per merge for no accuracy gain.
- ``apply_bpe`` is an Arrow-batched pandas_udf with a per-batch
  word -> tokens memo, so each DISTINCT word is segmented once per
  batch regardless of corpus repetition.

Determinism: training tie-breaks (highest count, then lexicographically
smallest pair) and the apply order (lowest merge rank first, all
occurrences left-to-right) are fully pinned, so the same corpus always
yields the same vocabulary and segmentation.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "word_frequencies",
    "train_bpe",
    "train_bpe_from_frequencies",
    "bpe_segment_word",
    "apply_bpe",
    "bpe_token_count",
]

END = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str = "text", lowercase: bool = False
) -> DataFrame:
    """(word, count) over whitespace-split text — one shuffle, map-side
    combined."""
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    return (
        df.select(F.explode(F.split(c, r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
    )


def _merge_seg(seg: Tuple[str, ...], a: str, b: str) -> Tuple[str, ...]:
    """One merge step: fuse every (a, b) adjacency, left to right,
    non-overlapping — the paper's merge semantics."""
    out: List[str] = []
    i = 0
    n = len(seg)
    while i < n:
        if i + 1 < n and seg[i] == a and seg[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seg[i])
            i += 1
    return tuple(out)


def train_bpe_from_frequencies(
    word_freqs: Dict[str, int],
    num_merges: int,
    min_pair_count: int = 2,
    end_token: str = END,
) -> List[Tuple[str, str]]:
    """The classic driver-side merge loop over a word-frequency table.
    Deterministic: best pair = highest weighted count, ties broken by
    lexicographically smallest pair. Stops early when no pair reaches
    ``min_pair_count``."""
    segs = {w: tuple(w) + (end_token,) for w in word_freqs}
    merges: List[Tuple[str, str]] = []
    for _ in range(int(num_merges)):
        counts: Dict[Tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = segs[w]
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < min_pair_count:
            break
        merges.append(best)
        for w in segs:
            segs[w] = _merge_seg(segs[w], *best)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    min_pair_count: int = 2,
    max_vocab_words: int = 1_000_000,
    lowercase: bool = False,
) -> List[Tuple[str, str]]:
    """Train a BPE merge table on a corpus: distributed word counting,
    then the driver-side merge loop over the capped frequency table
    (top ``max_vocab_words`` words by count, ties by word — the only
    collect, bounded regardless of corpus size)."""
    wf = (
        word_frequencies(df, text_col, lowercase)
        .orderBy(F.desc("count"), "word")
        .limit(int(max_vocab_words))
        .collect()
    )
    return train_bpe_from_frequencies(
        {r["word"]: r["count"] for r in wf}, num_merges, min_pair_count
    )


def bpe_segment_word(
    word: str,
    ranks: Dict[Tuple[str, str], int],
    end_token: str = END,
) -> List[str]:
    """GPT-2-style apply: repeatedly fuse the LOWEST-rank adjacent
    pair (all its occurrences, left to right) until no mergeable pair
    remains. For any merge table produced by training this equals
    applying the merges sequentially in rank order (a merge's parts
    can only come from earlier merges)."""
    seg: Tuple[str, ...] = tuple(word) + (end_token,)
    while len(seg) > 1:
        best: Optional[Tuple[str, str]] = None
        br = -1
        for i in range(len(seg) - 1):
            r = ranks.get((seg[i], seg[i + 1]))
            if r is not None and (best is None or r < br):
                best, br = (seg[i], seg[i + 1]), r
        if best is None:
            break
        seg = _merge_seg(seg, *best)
    return list(seg)


def apply_bpe(
    df: DataFrame,
    text_col: str,
    merges: Sequence[Tuple[str, str]],
    out_col: str = "bpe_tokens",
    lowercase: bool = False,
) -> DataFrame:
    """``df`` + ``out_col`` ARRAY<STRING> of BPE tokens (words
    whitespace-split, each segmented under ``merges``). Arrow-batched;
    distinct words memoized per batch."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @pandas_udf("array<string>")
    def tok(texts: pd.Series) -> pd.Series:
        memo: Dict[str, List[str]] = {}

        def run(s):
            if s is None:
                return None
            if lowercase:
                s = s.lower()
            out: List[str] = []
            for w in s.split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = bpe_segment_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(run)

    return df.withColumn(out_col, tok(F.col(text_col)))


def bpe_token_count(tokens_col) -> Column:
    """Column: token count of an ``apply_bpe`` output column."""
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return F.size(c).cast("int")
