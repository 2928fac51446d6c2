"""MurmurHash3 x64_128 numpy kernel vs the JVM's own Guava
murmur3_128 — the same implementation the reference engine uses for
128-bit ids, reached via py4j so the known answers come from the real
library, not from constants baked into the test."""

from __future__ import annotations

import struct

import pytest

from quality_spark.functions.pyhash import (
    murmur3_x64_128,
    murmur3_x64_128_batch,
)

CASES = [
    b"",
    b"a",
    b"ab",
    b"hello world",
    b"0123456789abcde",          # 15: tail only, > 8
    b"0123456789abcdef",         # 16: exactly one block
    b"0123456789abcdef0",        # block + 1 tail byte
    b"0123456789abcdef01234567", # block + 8 tail bytes
    b"x" * 16 * 5,
    b"x" * (16 * 5 + 13),
    bytes(range(256)),
    "héllo wörld ünïcode £€".encode("utf-8"),
]


def _guava(spark):
    for cls in ("com.google.common.hash.Hashing",
                "org.sparkproject.guava.hash.Hashing"):
        try:
            parts = cls.split(".")
            obj = spark._jvm
            for p in parts:
                obj = getattr(obj, p)
            hf = obj.murmur3_128()
            hf.hashBytes(bytearray(b"probe"))
            return hf
        except Exception:
            continue
    return None


def test_murmur3_matches_guava(spark):
    hf = _guava(spark)
    if hf is None:
        pytest.skip("no Guava on the JVM classpath")
    for data in CASES:
        raw = bytes(b & 0xFF for b in hf.hashBytes(bytearray(data)).asBytes())
        exp = struct.unpack("<qq", raw)  # little-endian h1, h2
        assert murmur3_x64_128(data) == exp, f"mismatch for {data!r}"


def test_batch_equals_scalar_mixed_lengths(spark):
    i0, i1 = murmur3_x64_128_batch(CASES)
    for idx, data in enumerate(CASES):
        assert (int(i0[idx]), int(i1[idx])) == murmur3_x64_128(data)


def test_none_hashes_as_empty():
    i0, i1 = murmur3_x64_128_batch([None, b""])
    assert int(i0[0]) == int(i0[1]) and int(i1[0]) == int(i1[1])


def test_seed_changes_hash():
    assert murmur3_x64_128(b"abc", 0) != murmur3_x64_128(b"abc", 42)


# --- XXH3-64 (round 5) ----------------------------------------------------
# Official sanity vectors, vendored from the public xxHash repository
# (Cyan4973/xxHash cli/xsum_sanity_check.c, BSD-2): the test buffer is
# filled by byteGen = PRIME32; byte = byteGen >> 56; byteGen *= PRIME64.
# These were vendored INDEPENDENTLY of the implementation (which was
# written from the spec), so 20/20 agreement pins both sides.

_XSUM_PRIME32 = 2654435761
_XSUM_PRIME64 = 11400714785074694797

_XXH3_VECTORS = [
    (0, 0, 0x2D06800538D394C2),
    (0, _XSUM_PRIME64, 0xA8A6B918B2F0364A),
    (1, 0, 0xC44BDFF4074EECDB),
    (1, _XSUM_PRIME64, 0x032BE332DD766EF8),
    (6, 0, 0x27B56A84CD2D7325),
    (6, _XSUM_PRIME64, 0x84589C116AB59AB9),
    (12, 0, 0xA713DAF0DFBB77E7),
    (12, _XSUM_PRIME64, 0xE7303E1B2336DE0E),
    (24, 0, 0xA3FE70BF9D3510EB),
    (24, _XSUM_PRIME64, 0x850E80FC35BDD690),
    (48, 0, 0x397DA259ECBA1F11),
    (48, _XSUM_PRIME64, 0xADC2CBAA44ACC616),
    (80, 0, 0xBCDEFBBB2C47C90A),
    (80, _XSUM_PRIME64, 0xC6DD0CB699532E73),
    (195, 0, 0xCD94217EE362EC3A),
    (195, _XSUM_PRIME64, 0xBA68003D370CB3D9),
    (512, 0, 0x617E49599013CB6B),
    (512, _XSUM_PRIME64, 0x3CE457DE14C27708),
    (2048, 0, 0xDD59E2C3A5F038E0),
    (2048, _XSUM_PRIME64, 0x66F81670669ABABC),
]


def _xsum_test_buffer(n: int) -> bytes:
    m = (1 << 64) - 1
    buf = bytearray(n)
    g = _XSUM_PRIME32
    for i in range(n):
        buf[i] = (g >> 56) & 0xFF
        g = (g * _XSUM_PRIME64) & m
    return bytes(buf)


def test_xxh3_64_official_vectors():
    from quality_spark.functions.pyhash import xxh3_64

    buf = _xsum_test_buffer(2048)
    for ln, seed, want in _XXH3_VECTORS:
        assert xxh3_64(buf[:ln], seed) == want, (ln, seed)


def test_xxh3_64_batch_matches_scalar_and_nulls():
    import numpy as np

    from quality_spark.functions.pyhash import xxh3_64, xxh3_64_batch

    datas = [b"", b"a", b"hello world", b"x" * 200, b"y" * 300, None]
    got = xxh3_64_batch(datas)
    for i, b in enumerate(datas):
        want = xxh3_64(b if b is not None else b"")
        assert got[i] == np.int64(np.uint64(want)), i


def test_xxh3_sql_surface(spark):
    """hash_with('XXH3', …) through rule SQL text must equal the
    KAT-pinned python function over the engine's canonical utf-8
    encoding, and NULL inputs stay NULL."""
    import numpy as np

    from quality_spark.functions.lambdas import expand_sql
    from quality_spark.functions.pyhash import xxh3_64

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("alpha",), ("beta gamma",), (None,)], "s string"
    )
    out = df.select(
        F.expr(expand_sql("hash_with('XXH3', s)")).alias("h")
    ).collect()
    for r, s in zip(out, ["alpha", "beta gamma", None]):
        if s is None:
            assert r["h"] is None
        else:
            assert r["h"] == int(
                np.uint64(xxh3_64(s.encode())).astype(np.int64)
            )
    # multi-column canonical concat: matches the documented encoding
    two = spark.createDataFrame([("a", "b")], "x string, y string").select(
        F.expr(expand_sql("hash_with('XXH3', x, y)")).alias("h")
    ).collect()[0]["h"]
    assert two == int(np.uint64(xxh3_64("a\x01b".encode())).astype(np.int64))
