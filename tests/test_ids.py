"""ID / digest / RNG / codec functions (SURVEY §2.7)."""

from __future__ import annotations

import base64
import hashlib
import struct
import uuid as uuidlib

import pytest
from pyspark.sql import functions as F

from quality_spark.functions.lambdas import expand_sql


def _run(spark, sql):
    return spark.sql(f"SELECT {expand_sql(sql)} AS r").collect()[0]["r"]


def _md5_longs(payload: bytes):
    h = hashlib.md5(payload).digest()
    return struct.unpack(">qq", h)


def test_digest_to_longs_matches_hashlib(spark):
    got = _run(spark, "digest_to_longs('MD5', 'hello', 42)")
    exp = _md5_longs("hello\x0142".encode())
    assert tuple(got) == exp


def test_digest_sha256_four_longs(spark):
    got = _run(spark, "digest_to_longs('SHA-256', 'x')")
    h = hashlib.sha256(b"x").digest()
    exp = struct.unpack(">qqqq", h)
    assert tuple(got) == exp


def test_field_based_id_layout(spark):
    got = _run(spark, "field_based_id('MD5', 'k')")
    i0, i1 = _md5_longs(b"k")
    assert got["base"] == 2  # 2 longs, generic header 0 << 24
    assert (got["i0"], got["i1"]) == (i0, i1)


def test_id_base64_roundtrip(spark):
    got = _run(
        spark,
        "id_from_base64(id_base64(field_based_id('MD5', 'k')))",
    )
    i0, i1 = _md5_longs(b"k")
    assert (got["base"], got["i0"], got["i1"]) == (2, i0, i1)


def test_id_base64_bytes(spark):
    b64 = _run(spark, "id_base64(provided_id(1, 2))")
    raw = base64.b64decode(b64)
    base, l0, l1 = struct.unpack(">iqq", raw)
    assert (base, l0, l1) == (2, 1, 2)


def test_id_size(spark):
    assert _run(spark, "id_size(id_base64(provided_id(1, 2)))") == 160
    assert _run(spark, "id_size(id_base64(provided_id(7), 1))") == 96


def test_hash_with_murmur_matches_spark_hash(spark):
    got = _run(spark, "hash_with('MURMUR3_32', 'abc')")
    exp = spark.sql("SELECT CAST(hash(concat_ws('\\u0001', 'abc')) AS BIGINT) r").collect()[0]["r"]
    assert got == exp


def test_rng_uuid_valid(spark):
    u = _run(spark, "rng_uuid()")
    assert str(uuidlib.UUID(u)) == u


def test_rng_seeded_deterministic(spark):
    df = spark.range(5).select(F.expr(expand_sql("rng('X', 7)")).alias("r"))
    a = [tuple(r["r"]) for r in df.collect()]
    b = [tuple(r["r"]) for r in df.collect()]
    assert a == b  # same seed, same partitioning -> reproducible


def test_unique_id_unique_per_row(spark):
    df = spark.range(0, 10000, 1, 8).select(
        F.expr(expand_sql("unique_id()")).alias("u")
    )
    n = df.select("u.i0", "u.i1").distinct().count()
    assert n == 10000
    assert df.select("u.base").distinct().collect()[0][0] == (1 << 24) | 2


def test_as_uuid_long_pair_roundtrip(spark):
    u = "123e4567-e89b-12d3-a456-426614174000"
    got = _run(spark, f"as_uuid(long_pair_from_uuid('{u}').lower, long_pair_from_uuid('{u}').higher)")
    assert got == u
    # against python uuid semantics: higher = most significant 64 bits
    pair = _run(spark, f"long_pair_from_uuid('{u}')")
    pu = uuidlib.UUID(u)
    msb = (pu.int >> 64) & 0xFFFFFFFFFFFFFFFF
    lsb = pu.int & 0xFFFFFFFFFFFFFFFF
    def signed(x):
        return x - (1 << 64) if x >= (1 << 63) else x
    assert pair["higher"] == signed(msb)
    assert pair["lower"] == signed(lsb)


def test_rng_bytes(spark):
    from quality_spark.functions.macros import BUILTIN_MACROS
    from pyspark.sql import functions as F

    df = spark.range(100)
    # unseeded: 16 random bytes, all distinct across rows
    sql = BUILTIN_MACROS["rng_bytes"](())
    out = df.select(F.expr(sql).alias("b")).collect()
    assert all(len(r["b"]) == 16 for r in out)
    assert len({bytes(r["b"]) for r in out}) == 100
    # seeded: deterministic per seed
    sql_s = BUILTIN_MACROS["rng_bytes"](("'XO_RO_SHI_RO_128_PP'", "42"))
    a = spark.range(1).select(F.expr(sql_s).alias("b")).collect()[0]["b"]
    b = spark.range(1).select(F.expr(sql_s).alias("b")).collect()[0]["b"]
    assert bytes(a) == bytes(b) and len(a) == 16
