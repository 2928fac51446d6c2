"""PII detection / redaction for training-data curation.

Regex-based detection of emails, IPv4 addresses, and phone numbers —
the C4/RefinedWeb-style scrub pass applied before training. Counting
and redaction are pure JVM Column expressions (``regexp_count`` /
``regexp_replace``), so the pass is codegen'd, streaming-safe, and
costs one projection at any corpus size.

Patterns are deliberately written in the common Java-regex ∩ RE2
dialect subset (no backrefs, no lookaround) so the DuckDB oracle
evaluates the SAME pattern text — counts and redacted output match
bit-for-bit across engines.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: name → pattern, in REDACTION ORDER (emails first so the phone/IP
#: patterns never see their digit runs; dict order is preserved).
DEFAULT_PATTERNS: Dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    # optional +cc prefix, optional (parenthesized or bare) area code,
    # then the 3-4 local tail: covers +1-555-0100 / 555-123-4567 /
    # (555) 123-4567 / 555 123 4567 / 7-digit locals. Separators are
    # '-' and space ONLY — allowing '.' would swallow decimal numbers
    # ("123.4567") and collide with the IPv4 counter on dotted digit
    # runs; \b sits before each DIGIT group (a leading \b before the
    # optional '+' would reject " +1-..." — '+' is a non-word char).
    # No lookaround: stays in the Java-regex ∩ RE2 dialect.
    "phone": (
        r"(?:\+\d{1,2}[- ])?(?:\(\d{3}\)[- ]?|\b\d{3}[- ])?\b\d{3}[- ]\d{4}\b"
    ),
}


def _token(name: str) -> str:
    return f"<{name.upper()}>"


def _staged_counts(
    text_col: str, pats: Dict[str, str]
) -> Dict[str, Column]:
    """Per-pattern counts over PROGRESSIVELY-REDACTED text: pattern i
    counts matches in the text with patterns < i already replaced —
    exactly what :func:`redact_pii` redacts, so counts and redaction
    agree. Counting every pattern on the ORIGINAL text double-counts
    one item matching two patterns (an email whose local part embeds a
    phone-shaped digit run) and can fail a max_pii_total filter for a
    single real item."""
    col: Column = F.col(text_col)
    out: Dict[str, Column] = {}
    for name, p in pats.items():
        out[name] = F.regexp_count(col, F.lit(p)).cast("int")
        col = F.regexp_replace(col, F.lit(p), F.lit(_token(name)))
    return out


def pii_total_col(
    text_col: str = "text", patterns: Optional[Dict[str, str]] = None
) -> Column:
    """Total PII match count as one Column — THE single definition of
    the total, shared by :func:`with_pii_stats` and the filter
    pipeline. Counts follow the staged-redaction semantics of
    :func:`_staged_counts`."""
    pats = patterns or DEFAULT_PATTERNS
    total = None
    for c in _staged_counts(text_col, pats).values():
        total = c if total is None else total + c
    return total.cast("int")


def with_pii_stats(
    df: DataFrame,
    text_col: str = "text",
    patterns: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """Per-document match counts (one ``{name}_count`` column per
    pattern, plus ``pii_total``)."""
    pats = patterns or DEFAULT_PATTERNS
    counts = {
        f"{name}_count": c for name, c in _staged_counts(text_col, pats).items()
    }
    return df.select(
        "*",
        *[c.alias(n) for n, c in counts.items()],
        pii_total_col(text_col, pats).alias("pii_total"),
    )


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out: Optional[str] = None,
    patterns: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """Replace every match with ``<NAME>`` placeholder tokens, applying
    patterns in dict order (emails before digit-run patterns)."""
    pats = patterns or DEFAULT_PATTERNS
    col: Column = F.col(text_col)
    for name, p in pats.items():
        col = F.regexp_replace(col, F.lit(p), F.lit(_token(name)))
    return df.withColumn(out or f"{text_col}_redacted", col)


def pii_count_oracle(text_expr: str, name: str, patterns: Optional[Dict[str, str]] = None) -> str:
    """DuckDB count twin (RE2): same pattern text, single-quote
    escaped, over the SAME progressively-redacted text the Spark
    counts use (patterns before ``name`` already replaced)."""
    pats = patterns or DEFAULT_PATTERNS
    staged = text_expr
    for n, p in pats.items():
        esc = p.replace("'", "''")
        if n == name:
            return f"len(regexp_extract_all({staged}, '{esc}'))"
        staged = f"regexp_replace({staged}, '{esc}', '{_token(n)}', 'g')"
    raise KeyError(name)


def pii_redact_oracle(text_expr: str, patterns: Optional[Dict[str, str]] = None) -> str:
    """DuckDB redaction twin — chained global regexp_replace in the
    same pattern order."""
    pats = patterns or DEFAULT_PATTERNS
    expr = text_expr
    for name, p in pats.items():
        pp = p.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pp}', '{_token(name)}', 'g')"
    return expr
