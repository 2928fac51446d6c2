"""ID / digest / RNG function surface.

Reference: impl/hash/MessageDigestHashExpression.scala:54-78 (digests),
impl/id/model.scala:338-445 (id struct layout: ``base`` =
(nLongs << 0) | (header << 24), header 0 for generic-long ids, plus
``i0``/``i1`` payload longs), impl/id/GenericLongBasedIDExpression.scala:23-55,
impl/rng/RngExpression.scala:12-141, Base64Expressions.scala.

Compiled to built-in JVM expressions (md5/sha1/sha2/crc32/xxhash64/
hash/conv/hex/to_binary/base64) wherever Spark has the primitive —
no UDFs, fully codegen'd.  The supported digest/hash subset is
declared in SUPPORTED_DIGESTS / HASH_IMPLS:

- MURMUR3_32 is Spark's built-in ``hash()`` (Murmur3 x86_32, seed 42).
- XXH64 / XX is Spark's built-in ``xxhash64`` (true XXH64, seed 42).
- MURMUR3_128 is a real MurmurHash3 x64_128 (pyhash.py — vectorized
  numpy pandas UDF, bit-verified against the JVM's Guava
  ``murmur3_128``, the implementation the reference uses).
- XXH3 is a spec-exact one-shot XXH3-128 (pyhash.py — round 6), a
  2-long digest like the reference's (openhft
  ``LongTupleHashFunction.xx128`` — impl/hash/ZeroAllocation.scala:88,
  registered only in the tuple factory with length 2), pinned by the
  official vendored XXH128 sanity vectors across every length class.
  In single-long contexts (``hash_with``) it yields the digest's low64
  — the same convention this engine uses for MURMUR3_128.  (The
  reference's single-long za factory silently FALLS BACK to XX/XXH64
  for 'XXH3' — ZeroAllocation.scala:33-40 ``getOrElse`` — a silent
  substitution this engine deliberately does not reproduce.)
- SIPHASH24 (round 6) is spec SipHash-2-4 with Guava's default key —
  which IS the official paper test key, so the vendored reference
  vectors pin Guava compatibility directly (pyhash.py, vectorized).
- ADLER32 (round 6) is stdlib ``zlib.adler32`` — the same RFC 1950
  checksum Guava's adler32() wraps.
- The remaining zero-allocation exotics (CITY_1_1 / FARM_NA / METRO /
  WY_3 / MUM — reference impl/hash/ZeroAllocation.scala:32-96) have no
  public in-container implementation or spec KAT set to verify
  against, so they ``raise`` instead of silently answering with a
  different function.
"""

from __future__ import annotations

import random
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

#: long-valued hash impls usable for hash_field_based_id / za variants
#: (name -> number of payload longs). See module docstring for what
#: each maps to.
HASH_IMPLS = {
    "MURMUR3_32": 1,
    "MURMUR3_128": 2,
    "XXH64": 1,
    "XX": 1,
    "XXH3": 2,  # XXH3-128 tuple digest (reference ZeroAllocation.scala:88)
    # round 6: the remaining Guava-factory names
    # (HashFunctionExpression.scala:46-58) — SipHash-2-4 with Guava's
    # default key (= the official paper test key, vector-pinned) and
    # Adler-32 via stdlib zlib (the same RFC 1950 checksum Guava wraps)
    "SIPHASH24": 1,
    "ADLER32": 1,
}

#: reference families with no verifiable in-container implementation —
#: these error rather than alias to a different hash function.
#: XXH3 graduated OUT of this set via the vendored-KAT recipe (round 5
#: as XXH3-64; round 6 corrected to the reference's true XXH3-128),
#: and SIPHASH24/ADLER32 joined HASH_IMPLS in round 6 the same way
#: (official paper vectors / stdlib zlib as the pinning reference).
#:
#: CITY_1_1 / FARM_NA / FARM_UO / METRO / WY_3 / MUM remain refused
#: after an explicit round-6 feasibility pass, documented here with
#: the same rigor as the WELL rejection (pyrng.py):
#: - The container holds NO implementation to pin against: no
#:   city/farm/metro/wyhash artifact exists anywhere on the JVM
#:   classpath or in site-packages (swept), and the reference's own
#:   test suite pins no concrete hash VALUES (its id tests are
#:   schema/self-consistency checks through the same library).
#: - The published pinning artifact (e.g. CityHash's city_test.cc) is
#:   an expected-value table of HUNDREDS of arbitrary 64-bit
#:   constants keyed to a PRNG-filled buffer. Unlike xxHash's compact
#:   20-row sanity list or SipHash's sequential-byte vectors, a table
#:   of that size cannot be vendored reliably without network access
#:   — and a mis-vendored table is WORSE than none: it would drive
#:   the implementation to match wrong constants, shipping a wrong
#:   hash under the real algorithm's name with a green test.
#:
#: FINAL ADJUDICATION (round 13, 2026-08-16 — PERMANENT; re-open only
#: if a new oracle lands in the container). A fresh sweep found ONE
#: new candidate since round 6 — Spark's guava-33.4.8 bundles
#: ``Hashing.farmHashFingerprint64()`` — and it was evaluated and
#: found insufficient: it implements the UNSEEDED farmhashna
#: fingerprint, while the reference's za digest chain calls the
#: SEEDED factory for EVERY link (``ZeroAllocation.scala``
#: ``LongHashFunctionProxy``: ``hasher(buffer(0))`` — the previous
#: output seeds the next hash, and even the first link is
#: ``farmNa(0)``, the seeded function at seed 0, which farmhash
#: defines as ``Hash64WithSeed`` ≠ ``Hash64``). Pinning Hash64 via
#: Guava and adding the WithSeed wrapper from memory would put an
#: unverifiable constant in the output path of every chained hash —
#: the exact silent-wrong-stream failure this table exists to refuse.
#: Per-name verdicts:
#: - CITY_1_1 (CityHash64 v1.1): REJECTED — no implementation in
#:   guava/commons/JDK/numpy/duckdb; KAT table not vendorable.
#: - FARM_NA (farmhashna): REJECTED — Guava fingerprint is unseeded
#:   only (see above); seeded wrapper unverifiable.
#: - FARM_UO (farmhashuo): REJECTED — no implementation at all
#:   (Guava's fingerprint is the na family).
#: - METRO (MetroHash64): REJECTED — no implementation anywhere
#:   in-container.
#: - WY_3 (wyhash v3): REJECTED — no implementation anywhere
#:   in-container.
#: - MUM (mum-hash): REJECTED — no implementation anywhere
#:   in-container.
UNSUPPORTED_HASH_IMPLS = frozenset(
    {"CITY_1_1", "FARM_NA", "FARM_UO", "METRO", "WY_3", "MUM"}
)


def _hash_impl_error(impl: str) -> ValueError:
    if impl in UNSUPPORTED_HASH_IMPLS:
        return ValueError(
            f"hash impl {impl!r} is not implemented bit-compatibly in this "
            f"engine; refusing to silently substitute a different hash. "
            f"Supported: {sorted(HASH_IMPLS)} + digests {sorted(set(SUPPORTED_DIGESTS))}"
        )
    return ValueError(
        f"hash impl {impl!r} not in supported subset {sorted(HASH_IMPLS)}"
    )


def _concat_input(args: Tuple[str, ...]) -> str:
    """Canonical byte input for multi-column digests: string casts
    joined with an unlikely separator (the reference feeds raw value
    bytes into MessageDigest; the exact byte layout is digest-internal
    so this engine defines its own canonical encoding).

    ``concat``, NOT ``concat_ws``: concat_ws silently SKIPS NULL
    arguments, so ('x', NULL) and (NULL, 'x') would hash identically —
    distinct rows colliding on their \"unique\" id. concat propagates
    NULL, so any-null input yields a NULL digest/id, matching the
    reference's null-intolerant expressions. Byte layout for fully
    non-null inputs is unchanged (same separators, same positions)."""
    parts: list = []
    for i, a in enumerate(args):
        if i:
            parts.append("'\\u0001'")
        parts.append(f"CAST(({a}) AS STRING)")
    if len(parts) == 1:
        return parts[0]
    return f"concat({', '.join(parts)})"


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
        raise _hash_impl_error(impl)
    n = HASH_IMPLS[impl]
    x = _concat_input(args[1:])
    base = (n << 0) | (GENERIC_LONGS_HEADER << HEADER_OFFSET)
    if impl == "MURMUR3_32":
        return f"named_struct('base', {base}, 'i0', CAST(hash({x}) AS BIGINT))"
    if impl == "MURMUR3_128":
        # real MurmurHash3 x64_128 (pyhash.py). The duplicated UDF call
        # is collapsed by Spark's Python-UDF extraction (one
        # ArrowEvalPython, verified in test_ids.py).
        from .pyhash import ensure_python_hashes

        ensure_python_hashes()
        h = f"qs_murmur3_128({x})"
        return (
            f"named_struct('base', {base}, 'i0', ({h}).i0, 'i1', ({h}).i1)"
        )
    if impl == "XXH3":
        # XXH3-128 tuple digest, 2 longs like the reference
        # (ZeroAllocation.scala:88; ADVICE r5 high finding)
        from .pyhash import ensure_python_hashes

        ensure_python_hashes()
        h = f"qs_xxh3_128({x})"
        return (
            f"named_struct('base', {base}, 'i0', ({h}).i0, 'i1', ({h}).i1)"
        )
    if impl in ("SIPHASH24", "ADLER32"):
        from .pyhash import ensure_python_hashes

        ensure_python_hashes()
        fn = "qs_siphash24" if impl == "SIPHASH24" else "qs_adler32"
        return f"named_struct('base', {base}, 'i0', {fn}({x}))"
    return f"named_struct('base', {base}, 'i0', xxhash64({x}, 42))"


def _za_field_based_id(args):
    return _hash_field_based_id(args)


def _za_longs_field_based_id(args):
    return _hash_field_based_id(args)


def _murmur3_id(args):
    # reference: 128-bit Guava murmur3 — dispatches to the real
    # MurmurHash3 x64_128 pandas UDF (pyhash.py, bit-verified vs Guava)
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


def _parse_long_literal(arg: str, what: str) -> int:
    try:
        return int(str(arg).strip())
    except ValueError:
        raise ValueError(
            f"{what} must be an integer literal (reference requires "
            f"literals too — RuleRegistrationFunctions.scala:340-376), "
            f"got {arg!r}"
        )


def _seeded_rng_sql(args, what: str) -> str:
    # ('ALGO'[, seed]) -> counter-mode pair stream (pyrng.py); the
    # algorithm name is honored as a distinct stream family, unknown
    # names error (previously the ALGO argument was silently ignored).
    from .pyrng import ensure_python_rng, rng_algo_id

    aid = rng_algo_id(_strip_str(args[0]))
    seed = _parse_long_literal(args[1], f"{what} seed") if len(args) > 1 else 0
    ensure_python_rng()
    return (
        f"qs_rng_pair({aid}, CAST({seed} AS BIGINT), "
        f"monotonically_increasing_id())"
    )


def _rng(args):
    # rng() -> random 128-bit long pair (uuid() is Spark's built-in
    # secure RNG); rng('ALGO'[, seed]) -> seeded reproducible stream
    # (reference: RuleRegistrationFunctions.scala:362-376, default
    # XO_RO_SHI_RO_128_PP seed 0)
    if len(args) == 0:
        # uuid4 strings carry FIXED nibbles (version at hex position
        # 13, variant top bits at 17) — a 16-char window covering them
        # would pin ~6 of the 128 output bits. Each conv below reads
        # the first 8 hex chars (all clean) of its OWN uuid() eval
        # (nondeterministic -> no subexpression merging), so the pair
        # is a genuinely uniform 128 bits from four independent draws.
        clean8 = (
            "CAST(conv(substring(replace(uuid(), '-', ''), 1, 8), 16, 10) "
            "AS BIGINT)"
        )
        half = f"(({clean8} << 32) | {clean8})"
        return f"named_struct('lower', {half}, 'higher', {half})"
    if len(args) > 2:
        raise _arity_error("rng", args, "0-2 ('ALGO'[, seed])")
    return _seeded_rng_sql(args, "rng")


def _rng_uuid(args):
    if len(args) == 0:
        return "uuid()"
    # long-pair struct -> uuid string (same as as_uuid(lower, higher))
    from .macros import _as_uuid

    a = args[0]
    return _as_uuid((f"({a}).lower", f"({a}).higher"))


def _rng_id(args):
    # reference rng_ID('prefix'[, 'ALGO'[, seed]]) — arg 0 is ALWAYS the
    # prefix (RuleRegistrationFunctions.scala:448-459: every arity reads
    # getString(exps.head) as prefix; defaults XO_RO_SHI_RO_128_PP,
    # seed 0). The prefix names flattened output columns in the
    # reference's id model; this engine's ids are plain (base, i0, i1)
    # structs, so the prefix is accepted and otherwise unused.
    if len(args) < 1 or len(args) > 3:
        raise _arity_error("rng_id", args, "1-3 ('prefix'[, 'ALGO'[, seed]])")
    _strip_str(args[0])  # must be a string literal, like the reference
    base = (2 << 0) | (GENERIC_LONGS_HEADER << HEADER_OFFSET)
    rng_args = tuple(args[1:])
    if not rng_args:
        rng_args = ("'XO_RO_SHI_RO_128_PP'",)  # reference default, seed 0
    pair = _rng(rng_args)
    # seeded: duplicate qs_rng_pair calls collapse to one ArrowEvalPython
    # (and the UDF is a pure function of its inputs regardless);
    # unseeded: two independent random longs, still a valid random id
    return (
        f"named_struct('base', {base}, 'i0', ({pair}).lower, 'i1', ({pair}).higher)"
    )


def _rng_bytes(args):
    # random bytes as BINARY (reference: rngBytes,
    # impl/rng/RngExpression.scala:12-141; arities 0-3 with numBytes
    # last — RuleRegistrationFunctions.scala:346-360, default 16)
    if len(args) == 0:
        pair = _rng(())
        return f"concat(unhex(lpad(hex(({pair}).higher), 16, '0')), unhex(lpad(hex(({pair}).lower), 16, '0')))"
    if len(args) > 3:
        raise _arity_error("rng_bytes", args, "0-3 ('ALGO'[, seed[, numBytes]])")
    from .pyrng import ensure_python_rng, rng_algo_id

    aid = rng_algo_id(_strip_str(args[0]))
    seed = _parse_long_literal(args[1], "rng_bytes seed") if len(args) > 1 else 0
    nbytes = _parse_long_literal(args[2], "rng_bytes numBytes") if len(args) > 2 else 16
    if not 1 <= nbytes <= 1 << 20:
        raise ValueError(f"rng_bytes numBytes out of range: {nbytes}")
    ensure_python_rng()
    return (
        f"qs_rng_bytes({aid}, CAST({seed} AS BIGINT), {nbytes}, "
        f"monotonically_increasing_id())"
    )


def _unique_id(args):
    # snowflake-style guaranteed-unique 160-bit id: (salt, launch-ms) +
    # partition + per-partition row counter (reference packs MAC+ms+
    # partition+row — impl/id/GuaranteedUniqueIdExpression.scala:17-41;
    # monotonically_increasing_id is Spark's (partition << 33) | row).
    # i0 = 22-bit per-compile random salt << 42 | launch-ms (42 bits,
    # good to year 2109): where the reference's MAC distinguishes hosts,
    # the salt distinguishes two suites compiled in the same millisecond
    # (collision odds 2^-22 per same-ms pair, vs certainty before).
    base = (2 << 0) | (GUARANTEED_UNIQUE_HEADER << HEADER_OFFSET)
    ms = int(time.time() * 1000) & ((1 << 42) - 1)
    salt = random.getrandbits(22)
    i0 = (salt << 42) | ms
    if i0 >= 1 << 63:
        i0 -= 1 << 64
    return (
        f"named_struct('base', {base}, 'i0', CAST({i0} AS BIGINT), "
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
    if impl == "MURMUR3_128":
        from .pyhash import ensure_python_hashes

        ensure_python_hashes()
        return f"qs_murmur3_128_64({x})"
    if impl == "XXH3":
        # single-long context: low64 of the XXH3-128 digest (same
        # convention as MURMUR3_128 above; spec-exact, KAT-pinned)
        from .pyhash import ensure_python_hashes

        ensure_python_hashes()
        return f"(qs_xxh3_128({x})).i0"
    if impl == "SIPHASH24":
        from .pyhash import ensure_python_hashes

        ensure_python_hashes()
        return f"qs_siphash24({x})"
    if impl == "ADLER32":
        from .pyhash import ensure_python_hashes

        ensure_python_hashes()
        return f"qs_adler32({x})"
    if impl in HASH_IMPLS:  # XXH64 / XX: Spark's xxhash64 IS XXH64
        return f"xxhash64({x}, 42)"
    raise _hash_impl_error(impl)


def _hash_with_struct(args):
    if len(args) < 2:
        raise _arity_error("hash_with_struct", args, "2+ ('IMPL', cols…)")
    return f"named_struct('i0', {_hash_with(args)})"


def _za_hash_longs_with(args):
    # ('IMPL', cols…) -> ARRAY<BIGINT> of all payload longs (reference
    # za_Hash_Longs_With, RuleRegistrationFunctions.scala:497 — the
    # multi-long variant; 128-bit impls give 2 longs, 64-bit give 1)
    if len(args) < 2:
        raise _arity_error("za_hash_longs_with", args, "2+ ('IMPL', cols…)")
    impl = _strip_str(args[0]).upper()
    if impl in SUPPORTED_DIGESTS:
        return _digest_to_longs(args)
    if impl == "MURMUR3_128":
        from .pyhash import ensure_python_hashes

        ensure_python_hashes()
        h = f"qs_murmur3_128({_concat_input(args[1:])})"
        return f"array(({h}).i0, ({h}).i1)"
    if impl == "XXH3":
        # the reference's tuple factory: XXH3-128, both longs
        # (ZeroAllocation.scala:88-96, length 2)
        from .pyhash import ensure_python_hashes

        ensure_python_hashes()
        h = f"qs_xxh3_128({_concat_input(args[1:])})"
        return f"array(({h}).i0, ({h}).i1)"
    return f"array({_hash_with(args)})"


_register(_hash_with, "hash_with", "hashWith", "za_hash_with", "zaHashWith")
_register(
    _hash_with_struct,
    "hash_with_struct",
    "hashWithStruct",
    "za_hash_with_struct",
    "za_hash_longs_with_struct",
)
_register(_za_hash_longs_with, "za_hash_longs_with", "zaHashLongsWith")
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
