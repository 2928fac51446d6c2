"""ID / digest / RNG function surface.

Reference: impl/hash/MessageDigestHashExpression.scala:54-78 (digests),
impl/id/model.scala:338-445 (id struct layout: ``base`` =
(nLongs << 0) | (header << 24), header 0 for generic-long ids, plus
``i0``/``i1`` payload longs), impl/id/GenericLongBasedIDExpression.scala:23-55,
impl/rng/RngExpression.scala:12-141, Base64Expressions.scala.

All compiled to built-in JVM expressions (md5/sha1/sha2/crc32/xxhash64/
hash/conv/hex/to_binary/base64) — no UDFs, fully codegen'd. Supported
digest/hash subset is declared in SUPPORTED_DIGESTS / HASH_IMPLS; the
reference's exotic Guava/zero-allocation families map onto xxhash64
seeds (statistically equivalent, not bit-compatible — documented).
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

from .macros import _arity_error, _register, _strip_str

GENERIC_LONGS_HEADER = 0  # model.scala:384
GUARANTEED_UNIQUE_HEADER = 1  # model.scala:385
HEADER_OFFSET = 24  # model.scala:381

#: digest name → (spark hex-producing sql template, hex length)
SUPPORTED_DIGESTS = {
    "MD5": ("md5({x})", 32),
    "SHA-1": ("sha1({x})", 40),
    "SHA1": ("sha1({x})", 40),
    "SHA-256": ("sha2({x}, 256)", 64),
    "SHA256": ("sha2({x}, 256)", 64),
    "SHA-512": ("sha2({x}, 512)", 128),
    "SHA512": ("sha2({x}, 512)", 128),
}

#: long-valued hash impls usable for hash_field_based_id / za variants.
#: MURMUR3_32 is Spark's built-in hash(); the 64/128-bit families map
#: to xxhash64 with distinct seeds.
HASH_IMPLS = {
    "MURMUR3_32": 1,
    "MURMUR3_128": 2,
    "XXH64": 1,
    "XX": 1,
    "XXH3": 1,
    "CITY_1_1": 2,
    "FARM_NA": 2,
    "METRO": 2,
    "WY_3": 2,
}


def _concat_input(args: Tuple[str, ...]) -> str:
    """Canonical byte input for multi-column digests: string casts
    joined with an unlikely separator (the reference feeds raw value
    bytes into MessageDigest; the exact byte layout is digest-internal
    so this engine defines its own canonical encoding)."""
    casts = ", ".join(f"CAST(({a}) AS STRING)" for a in args)
    return f"concat_ws('\\u0001', {casts})"


def _hex_to_long(hex_expr: str, start: int) -> str:
    """Signed 64-bit from 16 hex chars at ``start`` (1-based), built
    from two 32-bit halves (conv yields unsigned decimal strings —
    a single 64-bit conv would overflow BIGINT under ANSI)."""
    hi = f"CAST(conv(substring({hex_expr}, {start}, 8), 16, 10) AS BIGINT)"
    lo = f"CAST(conv(substring({hex_expr}, {start + 8}, 8), 16, 10) AS BIGINT)"
    return f"(({hi} << 32) | {lo})"


def _digest_hex(impl: str, args: Tuple[str, ...]) -> Tuple[str, int]:
    key = impl.upper()
    if key not in SUPPORTED_DIGESTS:
        raise ValueError(
            f"digest {impl!r} not in supported subset {sorted(set(SUPPORTED_DIGESTS))}"
        )
    tmpl, hexlen = SUPPORTED_DIGESTS[key]
    return tmpl.format(x=_concat_input(args)), hexlen


def _digest_to_longs_parts(args: Tuple[str, ...]) -> Tuple[str, int]:
    if len(args) < 2:
        raise _arity_error("digest_to_longs", args, "2+ ('IMPL', cols…)")
    impl = _strip_str(args[0])
    hex_sql, hexlen = _digest_hex(impl, args[1:])
    n_longs = (hexlen + 15) // 16
    padded = f"rpad({hex_sql}, {n_longs * 16}, '0')"
    return padded, n_longs


def _digest_to_longs(args):
    padded, n = _digest_to_longs_parts(args)
    longs = ", ".join(_hex_to_long(padded, 1 + 16 * i) for i in range(n))
    return f"array({longs})"


def _digest_to_longs_struct(args):
    padded, n = _digest_to_longs_parts(args)
    fields = ", ".join(
        f"'i{i}', {_hex_to_long(padded, 1 + 16 * i)}" for i in range(n)
    )
    return f"named_struct({fields})"


def _field_based_id(args):
    # ('IMPL', cols…) -> id struct (base, i0, i1) — reference
    # GenericLongBasedID with FieldBasedID type, 2-long payload
    if len(args) < 2:
        raise _arity_error("field_based_id", args, "2+ ('IMPL', cols…)")
    impl = _strip_str(args[0])
    hex_sql, hexlen = _digest_hex(impl, args[1:])
    if hexlen < 32:
        raise ValueError(f"field_based_id needs a >=128-bit digest, got {impl!r}")
    base = (2 << 0) | (GENERIC_LONGS_HEADER << HEADER_OFFSET)
    return (
        f"named_struct('base', {base}, "
        f"'i0', {_hex_to_long(hex_sql, 1)}, "
        f"'i1', {_hex_to_long(hex_sql, 17)})"
    )


def _hash_field_based_id(args):
    # ('IMPL', cols…) with a long-hash impl: 1- or 2-long payload
    if len(args) < 2:
        raise _arity_error("hash_field_based_id", args, "2+ ('IMPL', cols…)")
    impl = _strip_str(args[0]).upper()
    if impl in SUPPORTED_DIGESTS:
        return _field_based_id(args)
    if impl not in HASH_IMPLS:
        raise ValueError(
            f"hash impl {impl!r} not in supported subset {sorted(HASH_IMPLS)}"
        )
    n = HASH_IMPLS[impl]
    x = _concat_input(args[1:])
    base = (n << 0) | (GENERIC_LONGS_HEADER << HEADER_OFFSET)
    if impl == "MURMUR3_32":
        return f"named_struct('base', {base}, 'i0', CAST(hash({x}) AS BIGINT))"
    fields = [f"'i{i}', xxhash64({x}, {42 + i})" for i in range(n)]
    return f"named_struct('base', {base}, {', '.join(fields)})"


def _za_field_based_id(args):
    return _hash_field_based_id(args)


def _za_longs_field_based_id(args):
    return _hash_field_based_id(args)


def _murmur3_id(args):
    # reference: 128-bit Guava murmur3 → here two xxhash64 seeds
    if len(args) < 1:
        raise _arity_error("murmur3_id", args, "1+")
    return _hash_field_based_id(("'MURMUR3_128'",) + tuple(args))


def _provided_id(args):
    # wrap caller-provided longs into the id struct
    if len(args) < 1:
        raise _arity_error("provided_id", args, "1+ (long cols)")
    base = (len(args) << 0) | (GENERIC_LONGS_HEADER << HEADER_OFFSET)
    fields = ", ".join(
        f"'i{i}', CAST(({a}) AS BIGINT)" for i, a in enumerate(args)
    )
    return f"named_struct('base', {base}, {fields})"


def _id_hex(id_sql: str, n_longs: int) -> str:
    parts = [f"lpad(hex(({id_sql}).base), 8, '0')"]
    for i in range(n_longs):
        parts.append(f"lpad(hex(({id_sql}).i{i}), 16, '0')")
    return f"concat({', '.join(parts)})"


def _id_base64(args):
    # id struct -> base64 of big-endian (base:int32, longs…) bytes
    if len(args) != 1 and len(args) != 2:
        raise _arity_error("id_base64", args, "1 (id struct[, nLongs])")
    n = int(args[1]) if len(args) == 2 else 2
    return f"base64(to_binary({_id_hex(args[0], n)}, 'hex'))"


def _id_from_base64(args):
    # base64 -> id struct (default 2-long/160-bit layout)
    if len(args) not in (1, 2):
        raise _arity_error("id_from_base64", args, "1-2 (b64[, nLongs])")
    n = int(args[1]) if len(args) == 2 else 2
    h = f"hex(unbase64({args[0]}))"
    base = (
        f"CAST(conv(substring({h}, 1, 8), 16, 10) AS BIGINT)"
    )
    low32 = f"(({base} & 4294967295) - ((({base} >> 31) & 1) * 4294967296))"
    fields = [f"'base', CAST({low32} AS INT)"]
    for i in range(n):
        fields.append(f"'i{i}', {_hex_to_long(h, 9 + 16 * i)}")
    return f"named_struct({', '.join(fields)})"


def _id_size(args):
    if len(args) != 1:
        raise _arity_error("id_size", args, "1")
    # bits: 32 base + 64 per payload long
    return f"(32 + 64 * ((length(unbase64({args[0]})) - 4) DIV 8))"


def _id_raw_type(args):
    if len(args) != 1:
        raise _arity_error("id_raw_type", args, "1")
    hdr = f"(({args[0]}).base >> {HEADER_OFFSET})"
    return (
        f"(CASE WHEN {hdr} = {GUARANTEED_UNIQUE_HEADER} THEN 'guaranteedunique' "
        f"ELSE 'genericlongs' END)"
    )


# --- RNG ---------------------------------------------------------------


def _rng(args):
    # random 128-bit long pair; uuid() is Spark's built-in secure RNG.
    # Seeded algorithm variants map to rand(seed) pairs (documented
    # subset of the reference's commons-rng algorithms).
    if len(args) == 0:
        u = "replace(uuid(), '-', '')"
        return (
            f"named_struct('lower', {_hex_to_long(u, 17)}, "
            f"'higher', {_hex_to_long(u, 1)})"
        )
    seed = args[1] if len(args) > 1 else "0"
    lo = f"CAST(floor(rand({seed}) * 9.223372036854775E18) AS BIGINT)"
    hi = f"CAST(floor(rand(CAST(({seed}) AS BIGINT) + 1) * 9.223372036854775E18) AS BIGINT)"
    return f"named_struct('lower', {lo}, 'higher', {hi})"


def _rng_uuid(args):
    if len(args) == 0:
        return "uuid()"
    # long-pair struct -> uuid string (same as as_uuid(lower, higher))
    from .macros import _as_uuid

    a = args[0]
    return _as_uuid((f"({a}).lower", f"({a}).higher"))


def _rng_id(args):
    base = (2 << 0) | (GENERIC_LONGS_HEADER << HEADER_OFFSET)
    pair = _rng(tuple(args))
    return (
        f"named_struct('base', {base}, 'i0', ({pair}).lower, 'i1', ({pair}).higher)"
    )


def _rng_bytes(args):
    # random 16 bytes as BINARY (reference: rngBytes,
    # impl/rng/RngExpression.scala:12-141); seeded variants derive from
    # the same rand(seed) pair as rng()
    pair = _rng(tuple(args))
    return f"concat(unhex(lpad(hex(({pair}).higher), 16, '0')), unhex(lpad(hex(({pair}).lower), 16, '0')))"


def _unique_id(args):
    # snowflake-style guaranteed-unique 160-bit id: launch-ms +
    # partition + per-partition row counter (reference packs MAC+ms+
    # partition+row — impl/id/GuaranteedUniqueIdExpression.scala:17-41;
    # monotonically_increasing_id is Spark's (partition << 33) | row)
    base = (2 << 0) | (GUARANTEED_UNIQUE_HEADER << HEADER_OFFSET)
    ms = int(time.time() * 1000)
    return (
        f"named_struct('base', {base}, 'i0', CAST({ms} AS BIGINT), "
        f"'i1', monotonically_increasing_id())"
    )


def _hash_with(args):
    # ('IMPL', cols…) -> single long hash (reference HashFunctionExpression)
    if len(args) < 2:
        raise _arity_error("hash_with", args, "2+ ('IMPL', cols…)")
    impl = _strip_str(args[0]).upper()
    x = _concat_input(args[1:])
    if impl == "MURMUR3_32":
        return f"CAST(hash({x}) AS BIGINT)"
    if impl in SUPPORTED_DIGESTS:
        hex_sql, _ = _digest_hex(_strip_str(args[0]), args[1:])
        return _hex_to_long(hex_sql, 1)
    if impl == "CRC32":
        return f"crc32(CAST({x} AS BINARY))"
    if impl in HASH_IMPLS:
        return f"xxhash64({x}, 42)"
    raise ValueError(f"hash impl {impl!r} not supported")


def _hash_with_struct(args):
    if len(args) < 2:
        raise _arity_error("hash_with_struct", args, "2+ ('IMPL', cols…)")
    return f"named_struct('i0', {_hash_with(args)})"


_register(_hash_with, "hash_with", "hashWith", "za_hash_with", "zaHashWith")
_register(
    _hash_with_struct,
    "hash_with_struct",
    "hashWithStruct",
    "za_hash_with_struct",
    "za_hash_longs_with_struct",
)
_register(_digest_to_longs, "digest_to_longs", "digestToLongs")
_register(_digest_to_longs_struct, "digest_to_longs_struct", "digestToLongsStruct")
_register(_field_based_id, "field_based_id", "fieldBasedID", "fieldBasedId")
_register(_hash_field_based_id, "hash_field_based_id", "hashFieldBasedID", "hashFieldBasedId")
_register(_za_field_based_id, "za_field_based_id", "zaFieldBasedID")
_register(_za_longs_field_based_id, "za_longs_field_based_id", "zaLongsFieldBasedID")
_register(_murmur3_id, "murmur3_id", "murmur3ID")
_register(_provided_id, "provided_id", "providedID")
_register(_id_base64, "id_base64", "idBase64")
_register(_id_from_base64, "id_from_base64", "idFromBase64")
_register(_id_size, "id_size", "idSize")
_register(_id_raw_type, "id_raw_type", "idRawType")
_register(_rng, "rng")
_register(_rng_bytes, "rng_bytes", "rngBytes")
_register(_rng_uuid, "rng_uuid", "rngUuid", "rngUUID")
_register(_rng_id, "rng_id", "rngID")
_register(_unique_id, "unique_id", "uniqueID", "uniqueId")
