"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (codec libraries are not available in this
environment): ``decode_stub_features`` produces deterministic fake
features derived from the payload hash, and ``decode_real`` raises
NotImplementedError with the integration point documented. Everything
Spark-side — schema, Arrow batch shape, mapInPandas signature,
partitioning — is real and tested, so swapping in a real decoder is a
one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def gen_media(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic synthetic media table: payload bytes derived from the
    id hash (stands in for real encoded frames)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(kinds, (F.pmod(F.xxhash64("id"), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.unhex(F.repeat(F.format_string("%016x", F.xxhash64("id", F.lit(1))), 8)).alias(
            "payload"
        ),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16_000).alias("sample_rate"),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000))).alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )
    return df


def decode_real(payload: bytes, kind: str, meta: dict) -> np.ndarray:
    """Integration point for a real decoder (PIL/libav/etc.)."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "plug a real decoder here — the Spark plumbing around it is complete"
    )


def _stub_features(payload_hashes: np.ndarray) -> np.ndarray:
    """Deterministic fake feature extraction: FEATURE_DIM pseudo-features
    from the payload hash — vectorized numpy, stands in for a batch
    decode+embed."""
    idx = np.arange(FEATURE_DIM, dtype=np.uint64)
    mixed = (payload_hashes[:, None] * np.uint64(0x9E3779B97F4A7C15)) ^ (
        (idx + 1) * np.uint64(0xBF58476D1CE4E5B9)
    )
    return ((mixed >> np.uint64(11)).astype(np.float64) % 1000.0) / 1000.0


def decode_stub_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction with real Arrow batch plumbing:
    input batches carry the binary payload; output is the typed feature
    schema. The only fake part is the innermost decode (see
    decode_real)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hashes = np.array(
                [
                    np.uint64(int.from_bytes(bytes(p)[:8], "big", signed=False))
                    for p in pdf["payload"]
                ],
                dtype=np.uint64,
            )
            feats = _stub_features(hashes)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "features": list(feats),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return df.mapInPandas(extract, schema=FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    frame offset (explode of a sequence — pure relational fan-out; a real
    decoder would slice the payload per offset)."""
    frames = F.explode(
        F.sequence(F.lit(0).cast("long"), F.col("meta.duration_ms"), F.lit(every_ms).cast("long"))
    )
    return df.filter(F.col("kind") == "video").select(
        "media_id", frames.alias("frame_offset_ms"), "payload", "meta"
    )
