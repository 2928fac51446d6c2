"""HTML → text extraction: the first step of every web-corpus pipeline.

Beyond-reference LLM-pipeline surface: raw crawl documents arrive as
HTML; training corpora want the visible text with markup, scripts, and
head-matter gone and entities decoded. This module is a deliberately
boring, dependency-free extractor built on the stdlib
``html.parser.HTMLParser`` (no external readability/trafilatura — not
installable here, and the Spark-side contract is what matters):

- everything inside ``<script> <style> <noscript> <template> <head>``
  (incl. ``<title>``) is dropped;
- comments and processing instructions are dropped;
- character/entity references decode (``&amp;`` → ``&``);
- block-level boundaries (``p div li tr h1..h6 br section article
  table ul ol header footer nav blockquote pre``) become newlines so
  words from adjacent blocks never fuse;
- optional whitespace collapse: ``collapse='space'`` folds every
  ``[ \\t\\n\\r\\f\\v]+`` run to one space and trims spaces — an
  EXPLICIT ASCII class on purpose, chosen because Spark SQL, DuckDB
  RE2, and Python ``re`` all agree on it byte-for-byte (Python's bare
  ``\\s`` would also eat unicode whitespace and break oracle parity).

Scale design: extraction is an Arrow-batched ``pandas_udf`` (one
Python hop per batch, never per row) and is a PURE projection — no
shuffle; at 100 TB it runs at scan speed on every executor. Pair it
with a pushed-down length/content-type filter so obviously-binary rows
never reach Python.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from io import StringIO

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["extract_text", "html_to_text", "html_escape_expr"]

_DROP = {"script", "style", "noscript", "template", "head", "title"}
_BLOCK = {
    "p", "div", "li", "tr", "br", "h1", "h2", "h3", "h4", "h5", "h6",
    "section", "article", "table", "ul", "ol", "header", "footer",
    "nav", "blockquote", "pre", "hr", "form",
}
_WS_RUN = re.compile(r"[ \t\n\r\f\v]+")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        # convert_charrefs=True (default) decodes &amp; / &#65; inline
        super().__init__(convert_charrefs=True)
        self._buf = StringIO()
        self._drop_depth = 0

    def handle_starttag(self, tag, attrs):  # type: ignore[no-untyped-def]
        if tag in _DROP:
            self._drop_depth += 1
        elif tag in _BLOCK:
            self._buf.write("\n")

    def handle_endtag(self, tag):  # type: ignore[no-untyped-def]
        if tag in _DROP:
            self._drop_depth = max(0, self._drop_depth - 1)
        elif tag in _BLOCK:
            self._buf.write("\n")

    def handle_data(self, data):  # type: ignore[no-untyped-def]
        if self._drop_depth == 0:
            self._buf.write(data)

    def text(self) -> str:
        return self._buf.getvalue()


def extract_text(html: str, collapse: str = "none") -> str:
    """Pure-Python single-document extractor (the pandas_udf applies
    this per batch row; exposed for tests and sparkless use)."""
    p = _TextExtractor()
    p.feed(html or "")
    p.close()
    out = p.text()
    if collapse == "space":
        out = _WS_RUN.sub(" ", out).strip(" ")
    return out


def html_to_text(
    df: DataFrame,
    html_col: str = "html",
    out: str = "text",
    collapse: str = "none",
) -> DataFrame:
    """Adds the extracted-text column. Arrow-batched; NULL html →
    NULL text."""

    @pandas_udf("string")
    def _extract(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: None if x is None else extract_text(x, collapse)
        )

    return df.withColumn(out, _extract(F.col(html_col)))


def html_escape_expr(col: Column) -> Column:
    """``& < >`` escaping as a Column expression — used to CONSTRUCT
    deterministic HTML around known text (gate queries, tests) so the
    extractor's unescape provably inverts it."""
    return F.replace(
        F.replace(
            F.replace(col, F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;"),
        ),
        F.lit(">"), F.lit("&gt;"),
    )
