"""URL / domain operators for web-corpus curation: URL extraction,
domain histograms, and blocked-domain filtering (the C4/RefinedWeb
blocklist pass).

Pure JVM Column expressions (regexp_extract_all + array HOFs) — no
UDFs, codegen'd, streaming-safe. Patterns live in the Java-regex ∩ RE2
subset so the DuckDB oracle evaluates the same text (same contract as
llm/pii.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: scheme + host[:port][/path] — no lookaround, no backrefs
URL_PATTERN = r"https?://[A-Za-z0-9.-]+(?::\d+)?(?:/[^\s]*)?"
#: capture group 1 = the host
DOMAIN_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def _urls(text_col: str) -> Column:
    return F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), F.lit(0))


def _domains(text_col: str) -> Column:
    return F.transform(
        _urls(text_col),
        lambda u: F.regexp_extract(u, DOMAIN_PATTERN, 1),
    )


def with_url_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``url_count`` and the first URL's domain (empty string when
    the document has no URL)."""
    return df.select(
        "*",
        F.size(_urls(text_col)).cast("int").alias("url_count"),
        # try_element_at: ANSI mode makes element_at on an empty array
        # an error, not NULL (matches DuckDB's NULL-on-empty `[1]`)
        F.coalesce(F.try_element_at(_domains(text_col), F.lit(1)), F.lit("")).alias(
            "first_domain"
        ),
    )


def domain_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(domain, n_urls) across the corpus — explode + one partial-
    aggregated count shuffle."""
    return (
        df.select(F.explode(_domains(text_col)).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_urls"))
    )


def flag_blocked_domains(
    df: DataFrame,
    blocked: Sequence[str],
    text_col: str = "text",
    out: str = "blocked",
) -> DataFrame:
    """True when ANY URL in the document points at a blocked domain or
    a subdomain of one (suffix match on '.<domain>')."""
    if not blocked:
        return df.withColumn(out, F.lit(False))
    return df.withColumn(out, blocked_domain_cond(text_col, blocked))


def blocked_domain_cond(text_col: str, blocked: Sequence[str]) -> Column:
    """Boolean Column: any URL in ``text_col`` points at a blocked
    domain or subdomain — THE single definition of the match predicate,
    shared by :func:`flag_blocked_domains` and the filter pipeline so
    the two can never drift."""
    lowered = [b.lower() for b in blocked]

    def matches(d: Column) -> Column:
        cond = None
        for lb in lowered:
            this = (F.lower(d) == lb) | F.lower(d).endswith("." + lb)
            cond = this if cond is None else (cond | this)
        return cond

    return F.exists(_domains(text_col), matches)


def url_stats_oracle_exprs(text_expr: str) -> dict:
    """DuckDB twins: column-name → SQL."""
    u = f"regexp_extract_all({text_expr}, '{URL_PATTERN}')"
    d = f"list_transform({u}, x -> regexp_extract(x, '{DOMAIN_PATTERN}', 1))"
    return {
        "url_count": f"CAST(len({u}) AS INT)",
        "first_domain": f"coalesce({d}[1], '')",
        "_domains": d,
    }


def blocked_oracle_expr(text_expr: str, blocked: Sequence[str]) -> str:
    d = url_stats_oracle_exprs(text_expr)["_domains"]
    conds = " OR ".join(
        f"(lower(x) = '{b.lower()}' OR suffix(lower(x), '.{b.lower()}'))"
        for b in blocked
    )
    if not blocked:
        return "FALSE"
    return f"len(list_filter({d}, x -> {conds})) > 0"
