"""Multimodal column plumbing — images/audio/video as opaque binary.

The Spark-side machinery is real and tested: typed schema, Arrow-batched
``mapInPandas`` decode/feature/resize/frame-sample kernels with bounded
batch memory, partition sizing by byte-weight. The codec calls themselves
are STUBBED (no image/audio libs in this container): ``decode=`` selects
the deterministic fake (content-hash-seeded features, stable across runs)
or the NotImplementedError placeholder a real deployment replaces with
PIL/ffmpeg.

Schema convention::

    media_id: string
    media:    binary          -- opaque payload
    kind:     string          -- image | audio | video
    meta:     struct<width:int, height:int, sample_rate:int, duration_ms:int>
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 64


def real_decode(payload: bytes, kind: str) -> np.ndarray:  # pragma: no cover
    """Replace with PIL/torchaudio/ffmpeg in deployment."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use decode='fake' for the deterministic stand-in"
    )


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in: features seeded from the content digest, so
    the plumbing (batching, schema, ordering) is fully testable."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1, FEATURE_DIM).astype(np.float32)


def extract_features(
    df: DataFrame,
    decode: str = "fake",
    id_col: str = "media_id",
    media_col: str = "media",
    kind_col: str = "kind",
    batch_rows: int = 256,
) -> DataFrame:
    """binary → array<float> features via mapInPandas (one Arrow batch per
    call; memory bounded by batch_rows × payload size)."""
    dec = fake_decode if decode == "fake" else real_decode
    schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("features", ArrayType(FloatType(), False), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = [
                    dec(bytes(m), k).tolist()
                    for m, k in zip(chunk[media_col], chunk[kind_col])
                ]
                yield pd.DataFrame(
                    {"media_id": chunk[id_col].values, "features": feats}
                )

    return df.mapInPandas(run, schema=schema)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Video frame-sampling plan: one row per (media, frame_ts) — pure
    column expression, the decode itself happens in extract_features."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def partition_by_bytes(df: DataFrame, media_col: str = "media", target_mb: int = 64) -> DataFrame:
    """Repartition so each task holds ~target_mb of payload (large blobs skew
    task memory; row-count partitioning is the wrong unit here)."""
    stats = df.select(F.sum(F.length(media_col)).alias("b")).collect()[0]
    total = stats["b"] or 0
    n = max(1, int(total / (target_mb * 1024 * 1024)))
    return df.repartition(n)
