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


# --- XXH3-128 (round 6, ADVICE r5 high finding) ----------------------------
# Official XXH128 sanity vectors vendored from the same public
# cli/xsum_sanity_check.c table (same prime-fill buffer). One published
# row — (len=222, seeded) — could not be vendored with confidence and
# is deliberately omitted rather than risk pinning against a
# misremembered value; every other length class is covered in BOTH
# seeded and unseeded form, the 129-240 class unseeded, and its only
# seeded-specific code path (the negated-seed final mix32B, a one-line
# spec detail) shares all its mixing machinery with the pinned classes.
# The >240 rows additionally satisfy the structural invariant
# low64 == XXH3-64 (shared merge), which the test asserts.

_XXH128_VECTORS = [
    # (len, seed, low64, high64)
    (0, 0, 0x6001C324468D497F, 0x99AA06D3014798D8),
    (0, _XSUM_PRIME32, 0x5444F7869C671AB0, 0x92220AE55E14AB50),
    (1, 0, 0xC44BDFF4074EECDB, 0xA6CD5E9392000F6A),
    (1, _XSUM_PRIME32, 0xB53D5557E7F76F8D, 0x89B99554BA22467C),
    (6, 0, 0x3E7039BDDA43CFC6, 0x082AFE0B8162D12A),
    (6, _XSUM_PRIME32, 0x269D8F70BE98856E, 0x5A865B5389ABD2B1),
    (12, 0, 0x061A192713F69AD9, 0x6E3EFD8FC7802B18),
    (12, _XSUM_PRIME32, 0x9BE9F9A67F3C7DFB, 0xD7E09D518A3405D3),
    (24, 0, 0x1E7044D28B1B901D, 0x0CE966E4678D3761),
    (24, _XSUM_PRIME32, 0xD7304C54EBAD40A9, 0x3162026714A6A243),
    (48, 0, 0xF942219AED80F67B, 0xA002AC4E5478227E),
    (48, _XSUM_PRIME32, 0x7BA3C3E453A1934E, 0x163ADDE36C072295),
    (81, 0, 0x5E8BAFB9F95FB803, 0x4952F58181AB0042),
    (81, _XSUM_PRIME32, 0x703FBB3D7A5F755C, 0x2724EC7ADC750FB6),
    (222, 0, 0xF1AEBD597CEC6B3A, 0x337E09641B948717),
    (403, 0, 0xCDEB804D65C6DEA4, 0x1B6DE21E332DD73D),
    (403, _XSUM_PRIME64, 0x6259F6ECFD6443FD, 0xBED311971E0BE8F2),
    (512, 0, 0x617E49599013CB6B, 0x18D2D110DCC9BCA1),
    (512, _XSUM_PRIME64, 0x3CE457DE14C27708, 0x925D06B8EC5B8040),
    (2048, 0, 0xDD59E2C3A5F038E0, 0xF736557FD47073A5),
    (2048, _XSUM_PRIME32, 0x230D43F30206260B, 0x7FB03F7E7186C3EA),
    (2240, 0, 0x6E73A90539CF2948, 0xCCB134FBFA7CE49D),
    (2240, _XSUM_PRIME32, 0xED385111126FBA6F, 0x50A1FE17B338995F),
    (2367, 0, 0xCB37AEB9E5D361ED, 0xE89C0F6FF369B427),
    (2367, _XSUM_PRIME32, 0x6F5360AE69C2F406, 0xD23AAE4B76C31ECB),
]


def test_xxh3_128_official_vectors():
    from quality_spark.functions.pyhash import xxh3_128

    buf = _xsum_test_buffer(2367)
    for ln, seed, lo, hi in _XXH128_VECTORS:
        assert xxh3_128(buf[:ln], seed) == (lo, hi), (ln, seed)


def test_xxh3_128_low64_long_invariant():
    """For >240-byte inputs the 128-bit digest's low64 IS XXH3-64 (the
    two share the accumulate + merge path in the spec) — an independent
    cross-pin between the two KAT sets."""
    from quality_spark.functions.pyhash import xxh3_64, xxh3_128

    buf = _xsum_test_buffer(2367)
    for ln in (241, 300, 512, 1024, 2048, 2367):
        for seed in (0, 42, _XSUM_PRIME64):
            assert xxh3_128(buf[:ln], seed)[0] == xxh3_64(buf[:ln], seed)


def test_xxh3_128_batch_matches_scalar_and_nulls():
    import numpy as np

    from quality_spark.functions.pyhash import xxh3_128, xxh3_128_batch

    datas = [b"", b"a", b"hello world", b"x" * 200, b"y" * 300, None]
    lo, hi = xxh3_128_batch(datas)
    for i, b in enumerate(datas):
        wl, wh = xxh3_128(b if b is not None else b"")
        assert lo[i] == np.int64(np.uint64(wl)), i
        assert hi[i] == np.int64(np.uint64(wh)), i


def test_xxh3_sql_surface(spark):
    """XXH3 through rule SQL text is the 128-bit tuple digest (2
    longs, like the reference's LongTupleHashFunction.xx128 —
    ZeroAllocation.scala:88): za_hash_longs_with gives both longs,
    hash_with gives the low64, and NULL inputs stay NULL."""
    import numpy as np

    from quality_spark.functions.lambdas import expand_sql
    from quality_spark.functions.pyhash import xxh3_128

    from pyspark.sql import functions as F

    def s64(v: int) -> int:
        return int(np.uint64(v).astype(np.int64))

    df = spark.createDataFrame(
        [("alpha",), ("beta gamma",), (None,)], "s string"
    )
    out = df.select(
        F.expr(expand_sql("za_hash_longs_with('XXH3', s)")).alias("a"),
        F.expr(expand_sql("hash_with('XXH3', s)")).alias("h"),
    ).collect()
    for r, s in zip(out, ["alpha", "beta gamma", None]):
        if s is None:
            assert r["h"] is None and r["a"] == [None, None]
        else:
            lo, hi = xxh3_128(s.encode())
            assert r["a"] == [s64(lo), s64(hi)]
            assert r["h"] == s64(lo)
    # multi-column canonical concat: matches the documented encoding
    two = spark.createDataFrame([("a", "b")], "x string, y string").select(
        F.expr(expand_sql("hash_with('XXH3', x, y)")).alias("h")
    ).collect()[0]["h"]
    assert two == s64(xxh3_128("a\x01b".encode())[0])


def test_xxh3_id_surface(spark):
    """hash_field_based_id('XXH3', …) emits base nLongs=2 and both
    payload longs (ADVICE r5: was 1-long XXH3-64)."""
    import numpy as np

    from quality_spark.functions.lambdas import expand_sql
    from quality_spark.functions.pyhash import xxh3_128

    from pyspark.sql import functions as F

    row = spark.createDataFrame([("alpha",)], "s string").select(
        F.expr(expand_sql("za_longs_field_based_id('XXH3', s)")).alias("id")
    ).collect()[0]["id"]
    lo, hi = xxh3_128(b"alpha")
    assert row["base"] == 2  # nLongs=2, generic header 0
    assert row["i0"] == int(np.uint64(lo).astype(np.int64))
    assert row["i1"] == int(np.uint64(hi).astype(np.int64))


# --- SipHash-2-4 / Adler-32 (round 6) ---------------------------------------
# Official SipHash-2-4 reference vectors (Aumasson & Bernstein paper
# appendix / reference vectors.h): key = 000102...0f — which is ALSO
# Guava Hashing.sipHash24()'s default key, the implementation the
# reference engine uses for 'SIPHASH24' — message = bytes 00,01,..,len-1.

_SIPHASH_VECTORS = [
    (0, 0x726FDB47DD0E0E31),
    (1, 0x74F839C593DC67FD),
    (2, 0x0D6C8009D9A94F5A),
    (3, 0x85676696D7FB7E2D),
    (4, 0xCF2794E0277187B7),
    (5, 0x18765564CD99A68D),
    (6, 0xCBC9466E58FEE3CE),
    (7, 0xAB0200F58B01D137),
    (8, 0x93F5F5799A932462),
    (15, 0xA129CA6149BE45E5),
]


def test_siphash24_official_vectors():
    from quality_spark.functions.pyhash import siphash24

    msg = bytes(range(16))
    for ln, want in _SIPHASH_VECTORS:
        assert siphash24(msg[:ln]) == want, ln


def test_siphash24_batch_matches_scalar_and_nulls():
    import numpy as np

    from quality_spark.functions.pyhash import siphash24, siphash24_batch

    datas = [b"", b"a", b"hello world", bytes(range(23)), b"x" * 100, None]
    got = siphash24_batch(datas)
    for i, b in enumerate(datas):
        want = siphash24(b if b is not None else b"")
        assert got[i] == np.int64(np.uint64(want)), i


def test_adler32_matches_zlib():
    import zlib

    from quality_spark.functions.pyhash import adler32_batch

    datas = [b"", b"a", b"hello world", bytes(range(255)), None]
    got = adler32_batch(datas)
    for i, b in enumerate(datas):
        assert got[i] == (zlib.adler32(b if b is not None else b"") & 0xFFFFFFFF)


def test_siphash_adler_sql_surface(spark):
    """hash_with('SIPHASH24'/'ADLER32', …) through rule SQL equals the
    pinned python functions over the canonical utf-8 encoding; NULLs
    stay NULL; the id surface emits 1-long payloads with the right
    base."""
    import zlib

    import numpy as np

    from quality_spark.functions.lambdas import expand_sql
    from quality_spark.functions.pyhash import siphash24

    from pyspark.sql import functions as F

    df = spark.createDataFrame([("alpha",), (None,)], "s string")
    out = df.select(
        F.expr(expand_sql("hash_with('SIPHASH24', s)")).alias("sip"),
        F.expr(expand_sql("hash_with('ADLER32', s)")).alias("adl"),
        F.expr(expand_sql("hash_field_based_id('SIPHASH24', s)")).alias("id"),
    ).collect()
    assert out[1]["sip"] is None and out[1]["adl"] is None
    b = "alpha".encode()
    assert out[0]["sip"] == int(np.uint64(siphash24(b)).astype(np.int64))
    assert out[0]["adl"] == (zlib.adler32(b) & 0xFFFFFFFF)
    assert out[0]["id"]["base"] == 1  # 1-long payload, generic header
    assert out[0]["id"]["i0"] == out[0]["sip"]
