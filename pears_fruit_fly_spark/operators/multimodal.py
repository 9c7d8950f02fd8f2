"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride as `binary` columns with a typed metadata struct —
the Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the codec work itself is STUBBED because the
media libraries are not present in this container:

* ``decode_media``            — deterministic fake decoder (content-hash
                                derived features) used by tests; shape-
                                compatible with a real decoder.
* ``decode_media_real``       — raises NotImplementedError unless PIL etc.
                                are importable (clearly-marked stub).

Batch shape: mapInPandas with Arrow transfer — bytes never pass through
per-row Python; one pandas batch in, one out. At scale media tables are
partitioned by (kind, date-ish id range) and the decode stage is a pure map
(zero shuffle), identical topology to the signature build.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),     # typed metadata (nullable)
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def make_media_fixture(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (no external data)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=int(rng.integers(64, 4096)), dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 1920)) if kind != "audio" else None,
                int(rng.integers(16, 1080)) if kind != "audio" else None,
                int(rng.integers(100, 60000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real feature extractor: 16 floats derived
    from the sha256 of the payload (stable across runs/partitions)."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return raw / 65535.0


def decode_media(df: DataFrame) -> DataFrame:
    """media table → (media_id, kind, n_bytes, features[16]).

    STUB decode: features are content-hash derived (deterministic fake); the
    Spark plumbing (Arrow batching, schema, zero-shuffle map) is the real
    production topology.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_features(bytes(p)) if p is not None else np.zeros(FEATURE_DIM, np.float32)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "features": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(_decode, FEATURES_SCHEMA)


def decode_media_real(df: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """Real decoder — requires media libs not present in this container."""
    try:
        import PIL  # noqa: F401, PLC0415
    except ImportError as e:
        raise NotImplementedError(
            "real media decode requires pillow/librosa/pyav; "
            "use decode_media (deterministic fake) in this environment"
        ) from e
    raise NotImplementedError("wire PIL decode here in production builds")


def frame_sample(df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Video 'frame sampling' stub: slice payload bytes at fixed strides.

    Real implementation would demux with pyav; the UDTF shape (one row in,
    N frame rows out via mapInPandas) is the production contract.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "video" or payload is None:
                    continue
                raw = bytes(payload)
                for j in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(j)
                    frames.append(raw[j * every_n_bytes : (j + 1) * every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(_frames, FRAME_SCHEMA)


def resize_stub(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Metadata-level resize (real pixel work needs PIL): clamps the typed
    width/height metadata and tags the intended transform — keeps the
    pipeline schema flowing for downstream stages."""
    return df.withColumns(
        {
            "width": F.when(F.col("width").isNotNull(), F.least(F.col("width"), F.lit(target_w))),
            "height": F.when(F.col("height").isNotNull(), F.least(F.col("height"), F.lit(target_h))),
            "transform": F.lit(f"resize:{target_w}x{target_h}:stub"),
        }
    )
