"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Decode status (round 5): **image (PNG) and audio (WAV/PCM16) decode is
REAL** — pure-stdlib codecs (`zlib` + `struct`, below) with full PNG
filter support (None/Sub/Up/Average/Paeth) and CRC verification, so no
external codec library is needed. ``decode_real`` dispatches to them;
only VIDEO remains environment-blocked (no container/codec parsing in
the stdlib) and raises NotImplementedError with the integration point
documented. ``decode_stub_features`` (hash-derived fake features) is
kept for the video lane and as the original round-3 contract surface.

Oracle posture for the real path: ``gen_real_media`` encodes a
DETERMINISTIC id-derived pixel/sample pattern (64-bit mixed
arithmetic, SQL-expressible), and ``decode_media_features`` recovers
per-band INTEGER sums from the payload bytes alone — the DuckDB
oracle recomputes the same sums from the id arithmetic without ever
touching the bytes, so a hash match certifies the whole
encode→decode→feature round trip.
"""

from __future__ import annotations

import struct
import zlib
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


# ── real codecs (pure stdlib: zlib + struct) ──────────────────────

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal REAL PNG encoder: 8-bit grayscale (h, w) or RGB
    (h, w, 3), non-interlaced, one filter type applied to every
    scanline (0..4 — non-zero types exist to exercise every decoder
    unfilter path in tests; 0 is the production default)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
        h, w = img.shape
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
        h, w = img.shape[:2]
        flat = img
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"PNG filter type must be 0..4, got {filter_type}")
    bpp = channels
    raw = bytearray()
    prior = np.zeros(w * channels, dtype=np.int32)
    for y in range(h):
        row = flat[y].reshape(-1).astype(np.int32)
        left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
        pleft = np.concatenate([np.zeros(bpp, np.int32), prior[:-bpp]])
        if filter_type == 0:
            enc = row
        elif filter_type == 1:
            enc = row - left
        elif filter_type == 2:
            enc = row - prior
        elif filter_type == 3:
            enc = row - (left + prior) // 2
        else:
            enc = row - _paeth(left, prior, pleft)
        raw.append(filter_type)
        raw.extend((enc % 256).astype(np.uint8).tobytes())
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Per-element Paeth predictor (PNG spec §9.4)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Minimal REAL PNG decoder: 8-bit grayscale / RGB, non-interlaced,
    ALL five scanline filters (None/Sub/Up/Average/Paeth), chunk-CRC
    verified. Returns uint8 (h, w) or (h, w, 3)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (0, 2) or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color_type} "
            f"interlace={interlace}); this decoder handles 8-bit "
            f"gray/RGB non-interlaced"
        )
    channels = 1 if color_type == 0 else 3
    stride = w * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data length mismatch")
    bpp = channels
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ft == 0:
            rec = row
        elif ft == 2:
            rec = (row + prior) % 256
        elif ft in (1, 3, 4):
            # left-neighbor recurrences are sequential per scanline
            rec = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                pl = prior[i - bpp] if i >= bpp else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + prior[i]) // 2
                else:
                    p = left + prior[i] - pl
                    pa = abs(p - left)
                    pb = abs(p - prior[i])
                    pc = abs(p - pl)
                    pred = (
                        left
                        if pa <= pb and pa <= pc
                        else (prior[i] if pb <= pc else pl)
                    )
                rec[i] = (row[i] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[y] = rec.astype(np.uint8)
        prior = rec
    return out.reshape((h, w)) if channels == 1 else out.reshape((h, w, 3))


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Minimal REAL WAV encoder: PCM16 mono little-endian RIFF."""
    pcm = np.asarray(samples, dtype=np.int16).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Minimal REAL WAV decoder: PCM16 mono. Returns (int16 samples,
    sample_rate); walks RIFF chunks, tolerating extras (LIST etc.)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
            if audio_fmt != 1 or channels != 1:
                raise ValueError(
                    f"unsupported WAV (fmt={audio_fmt} ch={channels}); "
                    f"this decoder handles PCM16 mono"
                )
        elif cid == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    return np.frombuffer(pcm, dtype="<i2"), rate


def decode_real(payload: bytes, kind: str, meta: dict) -> np.ndarray:
    """REAL decode dispatch: PNG for images, WAV for audio — both
    pure-stdlib codecs above, no external library. Video container
    parsing has no stdlib support and stays environment-blocked."""
    if kind == "image":
        return decode_png(bytes(payload))
    if kind == "audio":
        return decode_wav(bytes(payload))[0]
    raise NotImplementedError(
        "video decode needs a container/codec library this environment "
        "does not provide; plug one in here — the Spark plumbing and "
        "the image/audio decoders around it are complete"
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


# ── real-decode contract surface ──────────────────────────────────
# Deterministic id-derived patterns (64-bit wrapping arithmetic, the
# gen_media oracle precedent) so a SQL oracle can re-derive the
# EXPECTED band sums from media_id alone — a hash match then certifies
# the whole encode→decode→feature chain from the payload bytes.

IMG_SIDE = 16          # 16×16 gray image → 16 per-row band sums
AUD_SAMPLES = 256      # 256 PCM16 samples → 16 per-chunk band sums
N_BANDS = 16
_K_IMG_ID = 0x9E3779B97F4A7C15
_K_IMG_PX = 0xBF58476D1CE4E5B9
_K_AUD_ID = 0x94D049BB133111EB
_K_AUD_SMP = 13787848793156543929
_MASK64 = (1 << 64) - 1


def _pattern_pixels(media_id: int) -> np.ndarray:
    """uint8 (16, 16) deterministic image pattern:
    ``((id+1)·K1 + (p+1)·K2 mod 2^64) >> 24 mod 256`` per pixel p."""
    p = np.arange(IMG_SIDE * IMG_SIDE, dtype=np.uint64)
    v = (
        np.uint64((media_id + 1) * _K_IMG_ID & _MASK64)
        + (p + np.uint64(1)) * np.uint64(_K_IMG_PX)
    )
    return (
        ((v >> np.uint64(24)) % np.uint64(256))
        .astype(np.uint8)
        .reshape(IMG_SIDE, IMG_SIDE)
    )


def _pattern_samples(media_id: int) -> np.ndarray:
    """int16 (256,) deterministic PCM pattern:
    ``(((id+1)·K3 + (i+1)·K4 mod 2^64) >> 24 mod 65536) − 32768``."""
    i = np.arange(AUD_SAMPLES, dtype=np.uint64)
    v = (
        np.uint64((media_id + 1) * _K_AUD_ID & _MASK64)
        + (i + np.uint64(1)) * np.uint64(_K_AUD_SMP)
    )
    return (
        ((v >> np.uint64(24)) % np.uint64(65536)).astype(np.int64) - 32768
    ).astype(np.int16)


def gen_real_media(spark: SparkSession, n: int) -> DataFrame:
    """Media table with REAL encoded payloads: even ids carry an
    actual PNG of the deterministic pixel pattern, odd ids an actual
    WAV of the deterministic sample pattern. Payload encoding runs
    Arrow-batched in executors (map-only — embarrassingly parallel at
    any scale)."""

    @F.pandas_udf("binary")
    def payload_of(ids: pd.Series, kinds: pd.Series) -> pd.Series:
        out = []
        for mid, kind in zip(ids, kinds):
            if kind == "image":
                out.append(encode_png(_pattern_pixels(int(mid))))
            else:
                out.append(encode_wav(_pattern_samples(int(mid))))
        return pd.Series(out)

    kind = F.when(F.col("id") % 2 == 0, F.lit("image")).otherwise(
        F.lit("audio")
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload_of(F.col("id"), kind).alias("payload"),
        F.struct(
            F.lit(IMG_SIDE).alias("width"),
            F.lit(IMG_SIDE).alias("height"),
            F.lit(16_000).alias("sample_rate"),
            F.lit(AUD_SAMPLES * 1000 // 16_000).cast("long").alias(
                "duration_ms"
            ),
            F.when(F.col("id") % 2 == 0, F.lit("png")).otherwise(
                F.lit("pcm16")
            ).alias("codec"),
        ).alias("meta"),
    )


DECODE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("band_sum", T.LongType(), False),
    ]
)


def decode_media_features(df: DataFrame) -> DataFrame:
    """REAL decode → integer band features, one row per (media row,
    band): images decode from PNG bytes to pixels and emit 16 per-row
    pixel sums; audio decodes from WAV bytes to PCM16 and emits 16
    per-16-sample chunk sums. The features are exact integers computed
    ONLY from the decoded bytes — the contract oracle re-derives them
    from the id arithmetic instead, so agreement certifies the codec
    round trip. mapInPandas (Arrow batches in, typed rows out);
    map-only, no shuffle."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, kinds, bands, sums = [], [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                decoded = decode_real(bytes(payload), kind, {})
                if kind == "image":
                    per_band = decoded.astype(np.int64).sum(axis=1)
                else:
                    per_band = (
                        decoded.astype(np.int64)
                        .reshape(N_BANDS, -1)
                        .sum(axis=1)
                    )
                for b in range(N_BANDS):
                    ids.append(int(mid))
                    kinds.append(kind)
                    bands.append(b)
                    sums.append(int(per_band[b]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "kind": pd.Series(kinds, dtype="object"),
                    "band": pd.Series(bands, dtype="int32"),
                    "band_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(extract, schema=DECODE_FEATURES_SCHEMA)


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
