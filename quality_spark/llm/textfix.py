"""Encoding repair / unicode normalization — web-corpus text ops.

Beyond-reference LLM-pipeline surface (SURVEY §7 phase 9): real web
corpora are full of MOJIBAKE — UTF-8 byte sequences mis-decoded as
cp1252/latin-1 (once, sometimes twice), yielding the familiar
"Ã©"-for-"é" / "â€™"-for-"’" garbage. The repair trick (popularized by
the public ftfy library; reimplemented here from the idea, no code
shared) is that mojibake is nearly self-identifying: re-encoding the
garbled text as cp1252 and decoding as UTF-8 only SUCCEEDS when the
text really was mojibake — legitimate accented text re-encodes to
bytes that are invalid UTF-8 and is left untouched.

Scale design: detection signals are pure Column expressions (count of
marker sequences, non-ASCII ratio — no Python on the scan path, so a
"select suspicious docs" filter pushes down); the repair itself is an
Arrow-batched pandas_udf applied AFTER filtering to the suspicious
subset — at 100 TB you never pay Python for the ~97% of documents
whose signals are clean.
"""

from __future__ import annotations

import unicodedata
from typing import Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "mojibake_marker_count",
    "non_ascii_count",
    "add_encoding_signals",
    "fix_text_encoding",
    "normalize_unicode",
    "strip_control_chars",
]

#: the high-frequency cp1252-mojibake lead bytes: UTF-8 lead bytes
#: 0xC2-0xC3 decode to Â/Ã, 0xE2 to â (then â€x for the U+20xx
#: punctuation block), 0xD0/0xD1 to Ð/Ñ (Cyrillic pages). The
#: trailing char is OPTIONAL (`.?`): Java-regex '.' matches neither
#: end-of-string nor a line terminator, so a marker as the last char
#: of a document or immediately before '\n' must still count — with a
#: mandatory '.' such docs slipped past the suspicious-rows screen
#: and skipped repair (ADVICE r07)
_MARKER_RE = "(Ã.?|Â.?|â€.?|Ð.?|Ñ.?)"


def mojibake_marker_count(col) -> Column:
    """Column: number of mojibake marker sequences in ``col`` —
    Column-native (regexp_count), usable as a pushed-down filter."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(_MARKER_RE)).cast("int")


def non_ascii_count(col) -> Column:
    """Column: number of non-ASCII characters."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.length(c) - F.length(F.regexp_replace(c, r"[^\x00-\x7F]", ""))
    ).cast("int")


def add_encoding_signals(
    df: DataFrame, text_col: str = "text", prefix: str = "enc"
) -> DataFrame:
    """``df`` + ``<prefix>_mojibake_markers`` and
    ``<prefix>_non_ascii`` — the cheap Column-native screen that
    decides which rows are worth the Python repair pass."""
    return df.withColumns(
        {
            f"{prefix}_mojibake_markers": mojibake_marker_count(text_col),
            f"{prefix}_non_ascii": non_ascii_count(text_col),
        }
    )


def _sloppy_cp1252_encode(s: str) -> Optional[bytes]:
    """'Sloppy cp1252': cp1252 with the five unmapped bytes
    (81/8D/8F/90/9D) falling back to their latin-1 identity — the
    codec real-world mis-decoders effectively used, so it's the one
    that inverts them. Whole-string fast path; per-char only when a
    hole character appears."""
    try:
        return s.encode("cp1252")
    except UnicodeEncodeError:
        pass
    out = bytearray()
    for ch in s:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            o = ord(ch)
            if o > 0xFF:
                return None  # genuinely non-latin text: not mojibake
            out.append(o)
    return bytes(out)


def _repair_once(s: str) -> Optional[str]:
    """One un-garbling pass: text -> sloppy-cp1252 bytes -> UTF-8.
    None when the bytes are not valid UTF-8 (i.e. the text was NOT
    mojibake) — legitimate accented text re-encodes to invalid UTF-8
    and is therefore a fixed point."""
    b = _sloppy_cp1252_encode(s)
    if b is None:
        return None
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return None


def fix_text_encoding(
    df: DataFrame,
    text_col: str = "text",
    fixed_col: Optional[str] = None,
    passes: int = 2,
) -> DataFrame:
    """``df`` + ``<fixed_col>`` (default ``<text_col>_fixed``) and
    ``<fixed_col>_passes`` (how many un-garbling passes applied;
    0 = text was already clean). ``passes=2`` also unwinds
    DOUBLE-encoded mojibake ("ÃƒÂ©"). A repair is only accepted when
    the re-decode succeeds AND strictly shortens the text (mojibake
    expansion is always multi-char -> one char), so clean text is a
    fixed point."""
    out_col = fixed_col or f"{text_col}_fixed"
    np_col = f"{out_col}_passes"
    max_passes = int(passes)

    @pandas_udf("struct<fixed: string, n_passes: int>")
    def repair(texts: pd.Series) -> pd.DataFrame:
        fixed, np_ = [], []
        for s in texts:
            if s is None:
                fixed.append(None)
                np_.append(None)
                continue
            cur, n = s, 0
            for _ in range(max_passes):
                d = _repair_once(cur)
                if d is None or len(d) >= len(cur):
                    break
                cur, n = d, n + 1
            fixed.append(cur)
            np_.append(n)
        return pd.DataFrame({"fixed": fixed, "n_passes": np_})

    tmp = "__qs_textfix"
    return (
        df.withColumn(tmp, repair(F.col(text_col)))
        .withColumn(out_col, F.col(f"{tmp}.fixed"))
        .withColumn(np_col, F.col(f"{tmp}.n_passes"))
        .drop(tmp)
    )


def normalize_unicode(
    df: DataFrame, text_col: str, out_col: Optional[str] = None,
    form: str = "NFC",
) -> DataFrame:
    """Unicode normalization (NFC/NFKC/NFD/NFKD via the stdlib
    unicodedata tables) as an Arrow-batched projection."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"bad normalization form {form!r}")
    out = out_col or f"{text_col}_{form.lower()}"

    @pandas_udf("string")
    def norm(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda s: unicodedata.normalize(form, s) if s is not None else None
        )

    return df.withColumn(out, norm(F.col(text_col)))


def strip_control_chars(col, keep: str = "\t\n") -> Column:
    """Column: drop C0/C1 control characters except ``keep`` —
    Column-native regexp_replace (no Python)."""
    c = F.col(col) if isinstance(col, str) else col
    keep_esc = "".join(f"\\x{ord(ch):02x}" for ch in keep)
    # Java regex character-class intersection: control chars minus keep
    return F.regexp_replace(c, f"[\\p{{Cc}}&&[^{keep_esc}]]", "")
