"""Unit tests for the real media codecs (BMP/WAV/RV8) — decode
round-trips, error isolation, and foreign-byte robustness. The
Spark-vs-DuckDB value equivalence is covered by the oracle suite."""

from __future__ import annotations

import struct

import pytest

from libpdf_spark.operators.multimodal import (
    _params,
    decode_bmp,
    decode_media,
    decode_rv8,
    decode_wav,
    encode_bmp,
    encode_rv8,
    encode_wav,
)


def test_bmp_roundtrip_dimensions_and_determinism():
    b1 = encode_bmp(7, 24, 32)
    b2 = encode_bmp(7, 24, 32)
    assert b1 == b2  # formula-deterministic bytes
    f = decode_bmp(b1)
    assert (f["width"], f["height"], f["n_frames"]) == (24, 32, 1)
    assert 0 <= f["level_millis"] <= 255_000
    assert len(f["phash"]) == 32
    # different media_id → different content signature
    assert decode_bmp(encode_bmp(8, 24, 32))["phash"] != f["phash"]


def test_bmp_row_padding_is_handled():
    # w=18 → row bytes 54, padded stride 56: decode must skip padding
    f = decode_bmp(encode_bmp(3, 18, 16))
    assert (f["width"], f["height"]) == (18, 16)


def test_wav_roundtrip():
    f = decode_wav(encode_wav(5, 1024))
    assert f["sample_rate"] == 16000
    assert f["width"] is None and f["n_frames"] is None
    assert 0 <= f["level_millis"] <= 2048_000


def test_rv8_roundtrip():
    f = decode_rv8(encode_rv8(11, 16, 16, 6))
    assert (f["width"], f["height"], f["n_frames"]) == (16, 16, 6)


def test_decode_media_sniffs_magic():
    assert decode_media(encode_bmp(0, 16, 16))["n_frames"] == 1
    assert decode_media(encode_wav(1, 512))["sample_rate"] == 16000
    assert decode_media(encode_rv8(2, 16, 16, 4))["n_frames"] == 4


@pytest.mark.parametrize(
    "payload",
    [
        b"",                                  # empty
        b"\x89PNG\r\n\x1a\n",                 # unknown magic
        encode_bmp(1, 16, 16)[:40],           # truncated header
        encode_bmp(1, 16, 16)[:200],          # truncated pixels
        encode_wav(1, 512)[:20],              # missing data chunk
        encode_rv8(1, 16, 16, 4)[:50],        # truncated planes
        b"RIFF" + b"\x00" * 40,               # RIFF but not a sane WAV
    ],
)
def test_corrupt_payloads_raise_value_error(payload):
    with pytest.raises(ValueError):
        decode_media(payload)


def test_unsupported_bmp_depth_raises():
    good = encode_bmp(1, 16, 16)
    # flip bpp 24 → 8 in the BITMAPINFOHEADER
    bad = bytearray(good)
    struct.pack_into("<H", bad, 28, 8)
    with pytest.raises(ValueError, match="unsupported BMP"):
        decode_bmp(bytes(bad))


def test_stereo_wav_rejected_not_misdecoded():
    good = encode_wav(1, 256)
    bad = bytearray(good)
    struct.pack_into("<H", bad, 22, 2)  # channels 1 → 2
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(bytes(bad))


def test_params_vary_dimensions():
    # the corpus formulas must actually vary w/h/ns/nf across ids
    ps = [_params(i) for i in range(24)]
    assert len({p["iw"] for p in ps if p["kind"] == "image"}) > 1
    assert len({p["ih"] for p in ps if p["kind"] == "image"}) > 1
    assert len({p["ns"] for p in ps if p["kind"] == "audio"}) > 1
    assert len({p["nf"] for p in ps if p["kind"] == "video"}) > 1
