"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed with Arrow-batched mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partition-preserving
transforms) is real and tested; the actual media codecs are STUBBED —
this container has no image/audio libraries — behind
`set_decoder(...)` / a deterministic fake, each clearly marked.

Scale notes: binary payloads ride in Arrow record batches; decode /
feature-extract are embarrassingly parallel map-only passes (no
shuffle). `spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch
memory when payloads are MB-scale; repartition by size-bucket before
heavy decode to even out task times.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),       # images/video
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),    # audio/video
])

_DECODER: Callable[[bytes, str], np.ndarray] | None = None


def set_decoder(fn: Callable[[bytes, str], np.ndarray]) -> None:
    """Install a real media decoder (bytes, mime) -> ndarray. Absent a
    real codec library, the deterministic fake below is used."""
    global _DECODER
    _DECODER = fn


def _fake_decode(payload: bytes, mime: str) -> np.ndarray:
    """STUB: deterministic fake decode — an 8x8 'image' whose pixels are
    a digest of the payload. Replace with a real codec via set_decoder().
    Raises on None payload like a real decoder would."""
    if payload is None:
        raise NotImplementedError("no payload to decode")
    d = hashlib.sha256(bytes(payload)).digest()
    arr = np.frombuffer((d * 2)[:64], dtype=np.uint8).reshape(8, 8)
    return arr.astype(np.float32)


def _decode(payload: bytes, mime: str) -> np.ndarray:
    return (_DECODER or _fake_decode)(payload, mime)


FEATURE_SCHEMA = ("media_id long, kind string, feat_mean double, "
                  "feat_std double, feat_vec array<float>")


def extract_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract each media row (map-only, Arrow batches).

    Output: per-item summary stats + a flattened feature vector. The
    decode is the stub unless set_decoder() installed a real codec.
    """

    # capture the decoder BY VALUE at plan-build time: mapInPandas runs
    # in fresh executor Python workers where this module re-imports with
    # _DECODER=None — resolving the global inside the udf would silently
    # ignore set_decoder() and run the fake digest codec on every row
    dec = _DECODER or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for _, row in pdf.iterrows():
                try:
                    arr = dec(row["payload"], row.get("mime") or "")
                except Exception:
                    # real codecs raise TypeError/ValueError/OSError on
                    # null or corrupt payloads (only the stub raises
                    # NotImplementedError) — one bad row degrades to a
                    # null-feature row, it must not abort the whole job
                    feats.append((row["media_id"], row["kind"], None, None, None))
                    continue
                flat = arr.astype(np.float32).ravel()
                # stats in float64: float32 accumulation drifts in the
                # 6th decimal, which an exact oracle can't reproduce
                f64 = flat.astype(np.float64)
                feats.append((row["media_id"], row["kind"],
                              float(f64.mean()), float(f64.std()),
                              flat[:64].tolist()))
            yield pd.DataFrame(feats, columns=["media_id", "kind", "feat_mean",
                                               "feat_std", "feat_vec"])

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: real implementation needs an image codec. The fake
    re-digests the payload so output is deterministic; schema/batch
    plumbing (what a real resize would ride on) is exercised for real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                p = row["payload"]
                fake = hashlib.sha256(bytes(p) + f"{width}x{height}".encode()).digest() \
                    if p is not None else None
                out.append((row["media_id"], width, height, fake))
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "payload"])

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB frame sampling for video rows: emits (media_id, frame_ts_ms)
    rows derived from duration metadata — the explode pattern a real
    frame extractor would use, with the decode stubbed."""
    frames = F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))
    # NULL duration → no frames (greatest() skips NULLs, so without the
    # filter an unknown-duration video fabricated a phantom ts-0 frame);
    # duration 0 → no frames too (the greatest() clamp that keeps
    # sequence's bounds legal would otherwise emit a phantom frame at
    # ts 0 for a video with no content — review r12)
    return (df.where((F.col("kind") == "video")
                     & (F.col("duration_ms") > 0))
            .select("media_id", F.explode(frames).alias("frame_ts_ms")))


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benches (payload bytes
    derived from the id; kinds cycle image/audio/video)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        # ASCII-hex payload: still opaque bytes to Spark, but an
        # SQL-only oracle can regenerate it (DuckDB sha256 takes VARCHAR)
        payload = (hashlib.sha256(f"media-{seed}-{i}".encode())
                   .hexdigest() * 4).encode()
        rows.append((i, kind, bytearray(payload), f"x-fake/{kind}",
                     64 if kind != "audio" else None,
                     64 if kind != "audio" else None,
                     5000 if kind != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
