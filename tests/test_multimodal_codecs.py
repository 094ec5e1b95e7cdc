"""Driver-side unit tests for the multimodal codec boundary
(multimodal/columns.py pure functions).

The mapInPandas goldens (tests/test_multimodal.py) exercise these codecs
worker-side, where a driver tracer cannot see them; these tests call the
module-level pure functions directly — especially the ERROR branches that
back the corrupt-payload-isolation claim (one bad payload must degrade to
the labeled fake, never kill the Arrow batch). No SparkSession needed.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from opc2mongodb_spark.multimodal.columns import (
    _decode_bytes,
    _dhash_bytes,
    _encode_ppm,
    _parse_bmp,
    _parse_image,
    _parse_ppm,
    _parse_wav,
)
from tests.test_multimodal import _bmp_bytes, _expected_px, _ppm_bytes, _wav_bytes


# ---------------------------------------------------------------------------
# PPM
# ---------------------------------------------------------------------------


def test_ppm_roundtrip_with_header_comment():
    w, h, px = _parse_ppm(_ppm_bytes(6, 4))
    assert (w, h) == (6, 4)
    assert np.array_equal(px, _expected_px(6, 4))
    # encode → parse round-trips exactly
    again = _parse_ppm(_encode_ppm(px))
    assert np.array_equal(again[2], px)


@pytest.mark.parametrize(
    "payload,msg",
    [
        (b"P5\n2 2\n255\n" + b"\x00" * 12, "not a P6"),
        (b"P6\n2 2", "truncated PPM header"),
        (b"P6\n2 x\n255\n" + b"\x00" * 12, "bad PPM header"),
        (b"P6\n0 2\n255\n", "unsupported PPM dims/maxval"),
        (b"P6\n2 2\n65535\n" + b"\x00" * 24, "unsupported PPM dims/maxval"),
        (b"P6\n2 2\n255\n" + b"\x00" * 5, "truncated PPM raster"),
    ],
)
def test_ppm_error_branches(payload, msg):
    with pytest.raises(ValueError, match=msg):
        _parse_ppm(payload)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def test_bmp_bottom_up_and_top_down_agree():
    up = _parse_bmp(_bmp_bytes(5, 3))
    down = _parse_bmp(_bmp_bytes(5, 3, top_down=True))
    assert up[:2] == down[:2] == (5, 3)
    assert np.array_equal(up[2], down[2])
    assert np.array_equal(up[2], _expected_px(5, 3))


def _patched_bmp(w: int, h: int, *, off: int, fmt: str, val) -> bytes:
    b = bytearray(_bmp_bytes(w, h))
    struct.pack_into(fmt, b, off, val)
    return bytes(b)


@pytest.mark.parametrize(
    "payload,msg",
    [
        (b"XX" + b"\x00" * 60, "not a BMP"),
        (b"BM" + b"\x00" * 10, "not a BMP"),  # under 54 bytes
        (_patched_bmp(4, 2, off=14, fmt="<I", val=12), "pre-BITMAPINFOHEADER"),
        (_patched_bmp(4, 2, off=28, fmt="<H", val=8), "only 24bpp"),
        (_patched_bmp(4, 2, off=30, fmt="<I", val=1), "only 24bpp"),
        (_patched_bmp(4, 2, off=22, fmt="<i", val=0), "only 24bpp"),  # h == 0
        (_bmp_bytes(4, 2)[:-3], "truncated BMP raster"),
    ],
)
def test_bmp_error_branches(payload, msg):
    with pytest.raises(ValueError, match=msg):
        _parse_bmp(payload)


def test_parse_image_dispatch():
    assert _parse_image(_ppm_bytes(2, 2))[:2] == (2, 2)
    assert _parse_image(_bmp_bytes(2, 2))[:2] == (2, 2)
    with pytest.raises(ValueError, match="no stdlib codec"):
        _parse_image(b"\x89PNG garbage")


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def test_wav_parses_fmt_and_frame_count():
    got = _parse_wav(_wav_bytes(480))
    assert got == {"n_channels": 1, "sample_rate": 16000, "n_samples": 480}
    stereo = _parse_wav(_wav_bytes(7, rate=8000, n_ch=2))
    assert stereo == {"n_channels": 2, "sample_rate": 8000, "n_samples": 7}


def test_wav_word_aligned_odd_chunk_walk():
    # insert an ODD-sized junk chunk before fmt — the walk must advance by
    # the word-aligned size (size + pad byte) to land on the next chunk
    wav = bytearray(_wav_bytes(4))
    junk = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # 3 + 1 pad
    patched = wav[:12] + junk + wav[12:]
    struct.pack_into("<I", patched, 4, len(patched) - 8)
    assert _parse_wav(bytes(patched))["n_samples"] == 4


@pytest.mark.parametrize(
    "payload,msg",
    [
        (b"not audio at all" * 4, "not a RIFF/WAVE"),
        (b"RIFF" + b"\x00" * 4 + b"AVI " + b"\x00" * 30, "not a RIFF/WAVE"),
        # float PCM (tag 3) rejected
        (None, "only integer PCM"),
        # fmt present but no data chunk
        ("nodata", "missing fmt/data chunk"),
    ],
)
def test_wav_error_branches(payload, msg):
    if payload is None:  # build a float-PCM header
        b = bytearray(_wav_bytes(4))
        fmt_pos = b.index(b"fmt ") + 8
        struct.pack_into("<H", b, fmt_pos, 3)
        payload = bytes(b)
    elif payload == "nodata":
        b = bytearray(_wav_bytes(4))
        b[b.index(b"data"):] = b""  # drop the data chunk entirely
        struct.pack_into("<I", b, 4, len(b) - 8)
        payload = bytes(b)
    with pytest.raises(ValueError, match=msg):
        _parse_wav(payload)


# ---------------------------------------------------------------------------
# _decode_bytes: the layered decoder chain + labeled fake fallback
# ---------------------------------------------------------------------------


def test_decode_bytes_real_image_and_audio():
    img = _decode_bytes("image", _ppm_bytes(8, 5))
    assert (img["width"], img["height"], img["decoder"]) == (8, 5, "real")
    aud = _decode_bytes("audio", _wav_bytes(12))
    assert (aud["n_frames"], aud["decoder"]) == (12, "real")
    assert (aud["width"], aud["height"]) == (0, 0)


def test_decode_bytes_fake_fallback_is_deterministic_and_labeled():
    a = _decode_bytes("image", b"opaque blob")
    b = _decode_bytes("image", b"opaque blob")
    assert a == b and a["decoder"] == "fake"
    assert a["width"] >= 64 and a["height"] >= 64
    vid = _decode_bytes("video", b"opaque blob")
    assert vid["decoder"] == "fake" and vid["n_frames"] >= 1
    aud = _decode_bytes("audio", b"opaque blob")
    assert aud["decoder"] == "fake" and (aud["width"], aud["height"]) == (0, 0)


# ---------------------------------------------------------------------------
# _dhash_bytes: bit-deterministic perceptual hash + fake fallback
# ---------------------------------------------------------------------------


def test_dhash_real_path_properties():
    v1, kind1 = _dhash_bytes(_ppm_bytes(32, 32))
    v2, kind2 = _dhash_bytes(_ppm_bytes(32, 32))
    assert kind1 == kind2 == "real" and v1 == v2
    assert -(1 << 63) <= v1 < (1 << 63)  # signed-64 contract (Spark LongType)
    # the same gradient in BMP form decodes to the same pixels → same hash
    vb, _ = _dhash_bytes(_bmp_bytes(32, 32))
    assert vb == v1


def test_dhash_fake_fallback():
    v, kind = _dhash_bytes(b"not an image")
    assert kind == "fake"
    assert v == _dhash_bytes(b"not an image")[0]
    assert -(1 << 63) <= v < (1 << 63)
