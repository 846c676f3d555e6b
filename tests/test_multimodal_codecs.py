"""Real stdlib media codecs (round 5): PNG encode/decode across every
scanline filter and both color types, CRC/robustness failure modes,
WAV PCM16 round trip with extra RIFF chunks, and the Spark-side
decode_media_features band sums against a pure-Python re-derivation
from the id pattern (the contract oracle's arithmetic)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from logshipper_spark.datapipe import multimodal as mm


def _img(h, w, channels=1, seed=3):
    rng = np.random.RandomState(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    return rng.randint(0, 256, shape).astype(np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3])
def test_png_round_trip_every_filter(filter_type, channels):
    img = _img(11, 17, channels)
    out = mm.decode_png(mm.encode_png(img, filter_type))
    assert out.dtype == np.uint8
    assert np.array_equal(out, img)


def test_png_rejects_corruption_and_unsupported():
    img = _img(8, 8)
    good = mm.encode_png(img)
    bad = bytearray(good)
    bad[40] ^= 0xFF  # inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        mm.decode_png(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        mm.decode_png(b"JUNK" + good)
    # 16-bit depth is out of scope and must refuse loudly, not
    # mis-decode
    ihdr = struct.pack(">IIBBBBB", 8, 8, 16, 0, 0, 0, 0)
    hacked = (
        good[:8]
        + mm._png_chunk(b"IHDR", ihdr)
        + good[8 + 12 + 13 :]
    )
    with pytest.raises(ValueError, match="unsupported"):
        mm.decode_png(hacked)
    with pytest.raises(ValueError):
        mm.encode_png(img, filter_type=5)
    with pytest.raises(ValueError):
        mm.encode_png(np.zeros((4, 4, 2), np.uint8))


def test_wav_round_trip_and_extra_chunks():
    rng = np.random.RandomState(11)
    s = rng.randint(-32768, 32767, 333).astype(np.int16)
    data = mm.encode_wav(s, 8000)
    dec, rate = mm.decode_wav(data)
    assert rate == 8000 and np.array_equal(dec, s)
    # tolerate an extra (odd-length, word-padded) chunk before fmt
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    spliced = data[:12] + extra + data[12:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    dec2, rate2 = mm.decode_wav(spliced)
    assert rate2 == 8000 and np.array_equal(dec2, s)
    with pytest.raises(ValueError, match="RIFF"):
        mm.decode_wav(b"nope")


def test_decode_real_dispatch():
    px = mm._pattern_pixels(9)
    assert np.array_equal(mm.decode_real(mm.encode_png(px), "image", {}), px)
    sm = mm._pattern_samples(9)
    assert np.array_equal(mm.decode_real(mm.encode_wav(sm), "audio", {}), sm)
    with pytest.raises(NotImplementedError):
        mm.decode_real(b"", "video", {})


def _py_band_sums(mid: int) -> list[int]:
    """Pure-Python re-derivation of the expected band sums from the id
    arithmetic — the contract oracle's formula, independent of the
    codecs."""
    m64 = 1 << 64
    out = []
    if mid % 2 == 0:
        for band in range(mm.N_BANDS):
            t = 0
            for o in range(16):
                p = band * 16 + o
                v = ((mid + 1) * mm._K_IMG_ID + (p + 1) * mm._K_IMG_PX) % m64
                t += (v >> 24) % 256
            out.append(t)
    else:
        for band in range(mm.N_BANDS):
            t = 0
            for o in range(16):
                i = band * 16 + o
                v = ((mid + 1) * mm._K_AUD_ID + (i + 1) * mm._K_AUD_SMP) % m64
                t += (v >> 24) % 65536 - 32768
            out.append(t)
    return out


def test_decode_media_features_matches_pattern(spark):
    media = mm.gen_real_media(spark, 8)
    got = {}
    for r in mm.decode_media_features(media).collect():
        got.setdefault(r["media_id"], {})[r["band"]] = (
            r["kind"], r["band_sum"]
        )
    assert set(got) == set(range(8))
    for mid in range(8):
        exp = _py_band_sums(mid)
        kind = "image" if mid % 2 == 0 else "audio"
        for band in range(mm.N_BANDS):
            assert got[mid][band] == (kind, exp[band]), (mid, band)


def test_decode_media_features_streaming(spark, tmp_path):
    """The real decode runs under Structured Streaming unchanged:
    mapInPandas over a file stream (availableNow drain) produces the
    same band sums as the batch path — the L30 streaming story."""
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    media = mm.gen_real_media(spark, 6)
    media.write.parquet(in_dir)
    stream = spark.readStream.schema(mm.MEDIA_SCHEMA).parquet(in_dir)
    q = (
        mm.decode_media_features(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["media_id"], r["band"]): r["band_sum"]
        for r in spark.read.schema(mm.DECODE_FEATURES_SCHEMA)
        .parquet(out_dir)
        .collect()
    }
    assert len(got) == 6 * mm.N_BANDS
    for mid in range(6):
        exp = _py_band_sums(mid)
        for band in range(mm.N_BANDS):
            assert got[(mid, band)] == exp[band]
