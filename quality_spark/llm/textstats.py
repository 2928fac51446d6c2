"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure JVM Column expressions (split/filter/transform/regexp) — no
UDFs, so they run at full codegen speed over 100 TB and work in
Structured Streaming unchanged. Each operator has a DuckDB-SQL twin
(generated from the same spec) used by the correctness oracle.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic stopword lists for the lang-id heuristic (alphabetical
# language order is also the tie-break order)
STOPWORDS: Dict[str, List[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "en": ["the", "a", "and", "of", "to", "in", "is", "for", "on", "it"],
    "es": ["el", "los", "las", "y", "un", "una", "es", "en", "que", "por"],
    "fr": ["le", "les", "et", "une", "est", "dans", "que", "pour", "sur", "avec"],
    "zh": ["de", "le", "shi", "bu", "wo", "ni", "ta", "men", "zhe", "na"],
}

# quote characters deliberately excluded — keeps the class embeddable in
# single-quoted SQL string literals. Spark unescapes backslashes inside
# string literals (so the regex needs \\[ in the literal); DuckDB does not.
PUNCT_CLASS_SPARK = "[.,;:!?()\\\\[\\\\]{}-]"
PUNCT_CLASS_DUCK = "[.,;:!?()\\[\\]{}-]"


# single tokenizer shared with the dedup oracle twins — two copies
# could drift and break bit-parity between the text-stats and dedup
# oracles
from .dedup import tokens_sql as _tokens_sql


def _stop_hits_sql(toks: str, words: List[str], dialect: str) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    if dialect == "spark":
        return f"size(filter({toks}, t -> t IN ({lst})))"
    return f"len(list_filter({toks}, t -> t IN ({lst})))"


def text_stats_sqls(
    text: str, dialect: str, toks_override: str = None
) -> Dict[str, str]:
    """Column-name → SQL for the text-stats block. ``dialect`` is
    'spark' or 'duckdb'; the arithmetic is identical so values match
    bit-for-bit. ``toks_override`` names an already-materialized token
    array column — the inlined tokenizer otherwise re-splits the text
    once per reference (see dedup.shingles_from_tokens_sql)."""
    toks = toks_override or _tokens_sql(text, dialect)
    size_fn = "size" if dialect == "spark" else "len"
    tc = f"{size_fn}({toks})"
    chars = f"length({text})"
    if dialect == "spark":
        no_punct = f"length(regexp_replace({text}, '{PUNCT_CLASS_SPARK}', ''))"
    else:
        no_punct = f"length(regexp_replace({text}, '{PUNCT_CLASS_DUCK}', '', 'g'))"
    # nullif guards: empty / whitespace-only / NULL text would divide by
    # zero, which ABORTS the job under Spark 4's default ANSI mode (and
    # is an error in DuckDB too). nullif exists with identical
    # semantics in both dialects, so the ratios are NULL for degenerate
    # docs on both sides of the oracle.
    punct_ratio = f"(CAST({chars} - {no_punct} AS DOUBLE) / nullif({chars}, 0))"
    stop_hits = _stop_hits_sql(toks, STOPWORDS["en"], dialect)
    stop_ratio = f"(CAST({stop_hits} AS DOUBLE) / nullif({tc}, 0))"
    avg_len = f"(CAST({chars} AS DOUBLE) / nullif({tc}, 0))"
    # every constant cast to DOUBLE so neither engine routes through
    # DECIMAL arithmetic (which differs between Spark and DuckDB)
    d = "CAST({} AS DOUBLE)".format
    quality = (
        f"(least({d('1.0')}, CAST({tc} AS DOUBLE) / {d('200.0')}) * {d('0.4')} "
        f"+ least({d('1.0')}, {stop_ratio} * {d('4.0')}) * {d('0.3')} "
        f"+ greatest({d('0.0')}, {d('1.0')} - {punct_ratio} * {d('5.0')}) * {d('0.3')})"
    )
    return {
        "token_count": f"CAST({tc} AS INT)",
        "char_count": f"CAST({chars} AS INT)",
        "avg_token_len": avg_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": quality,
    }


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    # two-step: stage the token array once, then the stats reference
    # the COLUMN — inlined, the regex split re-evaluates once per
    # reference (~4x here; see dedup.shingles_from_tokens_sql)
    staged = df.select(
        "*", F.expr(_tokens_sql(text_col, "spark")).alias("__qs_toks")
    )
    sqls = text_stats_sqls(text_col, "spark", toks_override="__qs_toks")
    return staged.select(
        "*", *[F.expr(s).alias(n) for n, s in sqls.items()]
    ).drop("__qs_toks")


def lang_id_sql(text: str, dialect: str, toks_override: str = None) -> str:
    """Argmax of per-language stopword-hit scores; ties break to the
    alphabetically-first language (strict > scan in fixed order).
    ``toks_override`` names a materialized token-array column — the
    pairwise CASE references each score ~|langs| times, so the inlined
    tokenizer would re-split the text ~20x per row."""
    toks = toks_override or _tokens_sql(text, dialect)
    scores = {
        lang: _stop_hits_sql(toks, words, dialect)
        for lang, words in sorted(STOPWORDS.items())
    }
    langs = list(scores)
    # best = first lang whose score >= all later ones
    clauses = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"({scores[lang]}) >= ({scores[other]})" for other in langs[i + 1 :]
        )
        clauses.append(f"WHEN {conds} THEN '{lang}'")
    return f"(CASE {' '.join(clauses)} ELSE '{langs[-1]}' END)"


def with_lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    staged = df.select(
        "*", F.expr(_tokens_sql(text_col, "spark")).alias("__qs_toks")
    )
    return staged.select(
        "*", F.expr(lang_id_sql(text_col, "spark", "__qs_toks")).alias(out)
    ).drop("__qs_toks")


def fingerprint_sql(text: str, dialect: str) -> str:
    """Order/duplication-insensitive document fingerprint: md5 of the
    sorted distinct token set (deterministic across engines)."""
    toks = _tokens_sql(text, dialect)
    if dialect == "spark":
        canon = f"array_join(array_sort(array_distinct({toks})), ' ')"
    else:
        canon = f"array_to_string(list_sort(list_distinct({toks})), ' ')"
    return f"md5({canon})"


def with_fingerprint(
    df: DataFrame, text_col: str = "text", out: str = "fingerprint"
) -> DataFrame:
    return df.select("*", F.expr(fingerprint_sql(text_col, "spark")).alias(out))


def winnow_sql(
    text: str, k: int, w: int, dialect: str, toks_override: str = None
) -> str:
    """Winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD
    2003 — the MOSS algorithm): the distinct set of per-window MINIMUM
    k-gram hashes over a sliding window of ``w`` consecutive k-grams.
    GUARANTEE: any two documents sharing a run of ``w + k − 1`` tokens
    share at least one fingerprint (the shared window's min is
    selected in both) — a LOCAL, positional detection primitive that
    complements MinHash (global, probabilistic) for plagiarism-style
    and boilerplate-span detection.

    Returns a BIGINT-array SQL expression. Hashes are the portable
    60-bit md5 (``dedup.hash60_sql``), so both engines fingerprint
    identically; grams are POSITIONAL (no distinct before windowing —
    winnowing's guarantee needs every occurrence). A doc shorter than
    one full window emits the min of what it has; an empty/NULL doc
    emits an empty set. Expected density is the documented
    2/(w+1)·n_grams, so fingerprint volume is a tunable fraction of
    corpus token volume."""
    from .dedup import hash60_sql

    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k}, w={w}")
    toks = toks_override or _tokens_sql(text, dialect)
    if dialect == "spark":
        grams = (
            f"transform(sequence(1, greatest(size({toks}) - {k - 1}, 1)), "
            f"qs_i -> array_join(slice({toks}, qs_i, {k}), ' '))"
        )
        hashes = f"transform({grams}, qs_g -> {hash60_sql('qs_g', 'spark')})"
        fps = (
            f"array_distinct(transform("
            f"sequence(1, greatest(size(qs_h) - {w - 1}, 1)), "
            f"qs_j -> array_min(slice(qs_h, qs_j, {w}))))"
        )
        # bind the hash array once via a single-element outer transform
        # (size(toks)=0 guard mirrors shingles_sql's empty-set rule)
        # NULL text propagates NULL through the tokenizer — fold it
        # into the empty set (same rule as the null-safe samplers)
        return (
            f"(CASE WHEN ({toks}) IS NULL OR size({toks}) = 0 THEN array() "
            f"ELSE element_at(transform(array({hashes}), qs_h -> {fps}), 1) "
            f"END)"
        )
    grams = (
        f"list_transform(range(1, greatest(len({toks}) - {k - 1}, 1) + 1), "
        f"qs_i -> array_to_string({toks}[qs_i:qs_i+{k - 1}], ' '))"
    )
    hashes = f"list_transform({grams}, qs_g -> {hash60_sql('qs_g', 'duckdb')})"
    fps = (
        f"list_distinct(list_transform("
        f"range(1, greatest(len(qs_h) - {w - 1}, 1) + 1), "
        f"qs_j -> list_min(qs_h[qs_j:qs_j+{w - 1}])))"
    )
    return (
        f"(CASE WHEN ({toks}) IS NULL OR len({toks}) = 0 THEN []::BIGINT[] "
        f"ELSE list_transform([{hashes}], qs_h -> {fps})[1] END)"
    )


def with_winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    w: int = 8,
    out: str = "winnow_fps",
) -> DataFrame:
    """Winnowing fingerprint set as an array column — two-step
    projection (tokens first) so the regex split runs once per row
    (see dedup.shingles_from_tokens_sql)."""
    staged = df.select(
        "*", F.expr(_tokens_sql(text_col, "spark")).alias("__qs_toks")
    )
    return staged.select(
        "*",
        F.expr(
            winnow_sql(text_col, k, w, "spark", toks_override="__qs_toks")
        ).alias(out),
    ).drop("__qs_toks")


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """(id_a, id_b, n_shared_fps) — document pairs sharing >=
    ``min_shared`` winnowing fingerprints: guaranteed to surface every
    pair sharing a (w+k−1)-token run, with fingerprint volume (not
    token volume) driving the join. Explode → self-join on the
    fingerprint → one count groupBy; a fingerprint shared by f docs
    emits O(f²) candidates, so drop corpus-universal boilerplate fps
    upstream (same guidance as jaccard_pairs' skew note)."""
    fps = with_winnow_fingerprints(df, text_col, k, w, out="__fps").select(
        F.col(id_col).alias("id"), F.explode("__fps").alias("fp")
    )
    return (
        fps.alias("a")
        .join(fps.select(F.col("id").alias("id_b"), "fp").alias("b"), "fp")
        .filter(F.col("a.id") < F.col("id_b"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("id_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= int(min_shared))
    )


#: BPE-ish subword token estimate: word chunks of <=4 chars + digits.
#: Doubled backslash survives Spark's string-literal unescaping.
BPE_ISH_PATTERN = "[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\\\s]"


def with_token_estimate(
    df: DataFrame, text_col: str = "text", out: str = "token_estimate"
) -> DataFrame:
    """Subword-token count estimate via a BPE-ish regex (whitespace
    tokens are in with_text_stats)."""
    return df.select(
        "*",
        F.expr(
            f"size(regexp_extract_all({text_col}, '{BPE_ISH_PATTERN}', 0))"
        ).cast("int").alias(out),
    )


#: Unicode-script classes for script profiling — explicit codepoint
#: ranges embedded as LITERAL characters (not \u escapes), so the same
#: pattern string means the same thing under Java regex (Spark) and
#:  RE2 (DuckDB). Order is the dominant-script tie-break priority.
SCRIPT_CLASSES: List[Tuple[str, str]] = [
    ("latin", "A-Za-zÀ-ɏ"),
    ("cyrillic", "Ѐ-ӿ"),
    ("greek", "Ͱ-Ͽ"),
    ("arabic", "؀-ۿ"),
    ("devanagari", "ऀ-ॿ"),
    # han + hiragana/katakana + hangul — the CJK block for mix purposes
    ("cjk", "一-鿿぀-ヿ가-힯"),
]


def script_count_sqls(text: str, dialect: str) -> Dict[str, str]:
    """{n_<script>: SQL} — chars of ``text`` in each script class,
    counted as length minus length-after-removal (the same portable
    trick as non_ascii_count; regexp_replace is global in Spark,
    needs the 'g' flag in DuckDB)."""
    out: Dict[str, str] = {}
    for name, cls in SCRIPT_CLASSES:
        if dialect == "spark":
            cnt = (
                f"(length({text}) - length(regexp_replace({text}, '[{cls}]', '')))"
            )
        else:
            cnt = (
                f"(length({text}) - "
                f"length(regexp_replace({text}, '[{cls}]', '', 'g')))"
            )
        out[f"n_{name}"] = f"CAST({cnt} AS INTEGER)"
    return out


def script_profile_sqls(dialect: str) -> Dict[str, str]:
    """Derived columns over already-projected n_<script> counts:
    ``dominant_script`` (first class in SCRIPT_CLASSES order reaching
    the max count; 'none' when no scripted chars at all) and
    ``script_mix`` (1 - max/total over script chars — 0.0 for a pure
    single-script doc, rising toward 1 as scripts mix; NULL when no
    scripted chars). Mixed-script text is a strong SEO-spam /
    mojibake signal in web corpora. Both expressions are pure integer
    arithmetic + one exact IEEE division, so the oracle reproduces
    them bit-for-bit."""
    names = [f"n_{n}" for n, _ in SCRIPT_CLASSES]
    total = " + ".join(names)
    mx = "greatest(" + ", ".join(names) + ")"
    branches = " ".join(
        f"WHEN n_{n} = __qs_smx THEN '{n}'" for n, _ in SCRIPT_CLASSES
    )
    dominant = (
        f"CASE WHEN __qs_smx = 0 THEN 'none' {branches} ELSE 'none' END"
    )
    mix = (
        f"CASE WHEN ({total}) > 0 THEN "
        f"1.0 - CAST(__qs_smx AS DOUBLE) / ({total}) END"
    )
    # callers substitute __qs_smx; kept symbolic so the max expression
    # is evaluated once in a staged projection, not 7x inline
    return {"__max": mx, "dominant_script": dominant, "script_mix": mix}


def with_script_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc script histogram + dominant script + mix fraction —
    two staged narrow projections (counts, then derivations), zero
    shuffles, streaming-safe."""
    counts = script_count_sqls(text_col, "spark")
    staged = df.select(
        "*", *[F.expr(s).alias(n) for n, s in counts.items()]
    )
    derived = script_profile_sqls("spark")
    staged2 = staged.select(
        "*", F.expr(derived["__max"]).alias("__qs_smx")
    )
    return staged2.select(
        *df.columns,
        *counts.keys(),
        F.expr(derived["dominant_script"]).alias("dominant_script"),
        F.expr(derived["script_mix"]).alias("script_mix"),
    )
