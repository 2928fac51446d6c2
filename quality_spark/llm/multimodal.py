"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extraction plumbing over ``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are
STUBBED (deterministic fakes clearly marked, or NotImplementedError in
strict mode) — but everything Spark-side is real and tested: the
schema contract, Arrow batch shapes, partition-preserving mapInPandas
plumbing, and metadata handling. Swapping in PIL/librosa later touches
only the kernel function bodies.
"""

from __future__ import annotations

import hashlib
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


def extract_media_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """(id, features array<float>, n_bytes) via Arrow-batched
    mapInPandas — the real production shape: narrow, partition-
    preserving, bounded memory per batch regardless of table size."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )
    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(f"{media_col}.payload").alias("payload"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode_features(p if p is not None else b"", dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "features": [f.tolist() for f in feats],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
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
    sampled frame (id, frame_idx, ts_ms, frame binary). STUB decoder
    slices payload bytes deterministically."""
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
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for rid, p in zip(pdf["id"], pdf["payload"]):
                p = p or b""
                n = min(max_frames, max(1, len(p) // 16))
                for i in range(n):
                    rows["id"].append(rid)
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    rows["frame"].append(p[i * 16 : (i + 1) * 16])
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
    """Resize plumbing for image payloads: metadata math is REAL
    (aspect-preserving fit into width×height, like PIL thumbnail), the
    pixel transform is the documented STUB (deterministic payload
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
                fake = (seed * (n // len(seed) + 1))[:n]
                out["id"].append(rid)
                out["media"].append(
                    {
                        "payload": fake,
                        "meta": {
                            "media_type": m.get("media_type"),
                            "format": m.get("format"),
                            "width": w,
                            "height": h,
                            "duration_ms": m.get("duration_ms"),
                            "n_bytes": len(fake),
                        },
                    }
                )
            yield pd.DataFrame(out)

    return src.mapInPandas(kernel, schema=schema)
