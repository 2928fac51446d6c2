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
