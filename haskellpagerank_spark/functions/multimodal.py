"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video next to text as opaque
``binary`` columns. The container has no codec libraries, so the *decode*
step is stubbed (clearly-marked), but everything Spark-side is real and
tested: schemas, Arrow batch shape, partition-preserving ``mapInPandas``
kernels, and a deterministic fake feature extractor exercising the exact
UDF signature a real decoder would use.

Swap-in contract: replace ``_decode_stub`` with (e.g.) PIL/libav calls; the
batch iterator signature, output schema, and partitioning are unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)

FEATURE_DIM = 16


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap, real (non-stub) metadata: payload size and content hash —
    Catalyst-native, runs on the binary column without decoding."""
    return df.select(
        "*",
        F.length(F.col(payload_col)).alias("payload_bytes"),
        F.md5(F.col(payload_col)).alias("payload_md5"),
    )


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB: stands in for image/audio decode (codec libs absent here).

    Deterministic fake: a FEATURE_DIM float vector derived from the sha256
    of the payload — stable across partitions/retries, so tests can assert
    exact values. A real deployment replaces only this function.
    """
    dig = hashlib.sha256(payload).digest()
    raw = np.frombuffer((dig * ((FEATURE_DIM * 4) // len(dig) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32).astype(np.float64)
    return (raw / np.float64(2**32)).astype(np.float32)


def extract_features(media: DataFrame, payload_col: str = "payload",
                     id_col: str = "media_id") -> DataFrame:
    """(media_id, features: array<float>) via Arrow-batched mapInPandas.

    The batch loop is vectorized per-batch (one Python call per Arrow batch,
    numpy inside); only the decode itself is per-payload — unavoidable for
    codec work and identical to the real-decoder shape.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [
                _decode_stub(bytes(p), k).tolist()
                for p, k in zip(b[payload_col], b.get("kind", [""] * len(b)))
            ]
            yield pd.DataFrame({"media_id": b[id_col], "features": feats})

    cols = [id_col, payload_col] + (["kind"] if "kind" in media.columns else [])
    return media.select(*cols).mapInPandas(
        kernel, schema="media_id long, features array<float>")


def frame_sample_plan(media: DataFrame, every_ms: int = 1000,
                      id_col: str = "media_id") -> DataFrame:
    """(media_id, frame_ts_ms) sampling plan for video rows — pure Catalyst
    (sequence + explode); the decode of each frame is the stub above."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            F.col(id_col).alias("media_id"),
            F.explode(F.sequence(
                F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms))).alias("frame_ts_ms"),
        )
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """NOT IMPLEMENTED in-sandbox: real pixel resize needs an image codec.

    Kept as an explicit, typed surface so callers compile; raises at plan
    time rather than silently faking pixels.
    """
    raise NotImplementedError(
        "image resize requires a codec library (PIL/opencv) not present in "
        "this container; extract_features() demonstrates the Arrow plumbing"
    )
