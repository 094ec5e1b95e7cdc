"""Multimodal plumbing: schemas, Arrow batch shapes, deterministic stubs."""

from __future__ import annotations

from opc2mongodb_spark.multimodal.columns import (
    DECODED_SCHEMA,
    FEATURE_DIM,
    decode_media,
    documents_as_media,
    extract_features,
    sample_frames,
)
from opc2mongodb_spark.sources.tables import load_table


def _media(spark, sf_dir):
    return documents_as_media(load_table(spark, sf_dir, "documents"))


def test_media_frame_schema(spark, sf_dir):
    m = _media(spark, sf_dir)
    kinds = {r.kind for r in m.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    row = m.first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.declared_format == "synthetic/v1"


def test_decode_deterministic_and_payload_free(spark, sf_dir):
    m = _media(spark, sf_dir)
    d1 = decode_media(m)
    assert d1.schema == DECODED_SCHEMA
    assert "payload" not in d1.columns  # metadata only after decode
    rows1 = {r.media_id: (r.sha1, r.width, r.height, r.n_frames) for r in d1.collect()}
    rows2 = {
        r.media_id: (r.sha1, r.width, r.height, r.n_frames)
        for r in decode_media(m).collect()
    }
    assert rows1 == rows2  # stub decode is deterministic
    decoders = {r.decoder for r in d1.select("decoder").distinct().collect()}
    assert decoders == {"fake"}  # no codec libs in this container


def test_decode_audio_has_no_dimensions(spark, sf_dir):
    d = decode_media(_media(spark, sf_dir))
    audio = d.filter(d.kind == "audio").collect()
    assert audio and all(r.width == 0 and r.height == 0 for r in audio)
    video = d.filter(d.kind == "video").collect()
    assert video and all(r.n_frames >= 1 for r in video)


def test_feature_extraction_shape(spark, sf_dir):
    m = _media(spark, sf_dir)
    f = extract_features(m)
    rows = f.collect()
    assert len(rows) == m.count()
    for r in rows[:10]:
        assert len(r.features) == FEATURE_DIM
        assert abs(sum(r.features) - 1.0) < 1e-9  # normalized histogram


def test_frame_sampling(spark, sf_dir):
    m = _media(spark, sf_dir)
    frames = sample_frames(m, every_n=25)
    rows = frames.collect()
    assert rows, "expected sampled frames for video media"
    by_media: dict[int, list[int]] = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r.frame_no)
    for frame_nos in by_media.values():
        assert frame_nos == sorted(frame_nos)
        assert all(f % 25 == 0 for f in frame_nos)


def test_resize_images_shape_and_determinism(spark, sf_dir):
    """resize_images: only image rows cross the Python boundary, output
    payloads are deterministic for (content, target dims), sized to the
    target raster, and dims are the requested ones."""
    from opc2mongodb_spark.multimodal.columns import (
        documents_as_media,
        resize_images,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents").limit(30))
    out = resize_images(media, 64, 32).collect()
    assert out and all(r.kind == "image" for r in out)
    assert all(r.width == 64 and r.height == 32 for r in out)
    assert all(len(r.payload) == (64 * 32) // 64 for r in out)
    assert all(r.resizer == "fake" for r in out)  # no PIL in this container

    again = {r.media_id: bytes(r.payload) for r in resize_images(
        media, 64, 32).collect()}
    assert {r.media_id: bytes(r.payload) for r in out} == again
    # different target dims -> different deterministic bytes
    other = {r.media_id: bytes(r.payload) for r in resize_images(
        media, 32, 32).collect()}
    assert all(other[k] != v for k, v in again.items() if k in other)


def _ppm_bytes(w: int, h: int) -> bytes:
    """Deterministic P6 gradient with a comment line in the header."""
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    px = np.stack([(x * 7) % 256, (y * 11) % 256, (x + y) % 256], axis=-1)
    return (
        b"P6\n# synthetic fixture\n%d %d\n255\n" % (w, h)
        + px.astype("uint8").tobytes()
    )


def _bmp_bytes(w: int, h: int, top_down: bool = False) -> bytes:
    """Deterministic 24bpp uncompressed BMP (BITMAPINFOHEADER), with the
    4-byte row padding real writers emit."""
    import struct

    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    px = np.stack([(x * 7) % 256, (y * 11) % 256, (x + y) % 256], axis=-1).astype(
        "uint8"
    )
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[..., ::-1].reshape(h, w * 3)  # RGB -> BGR
    if not top_down:
        rows = rows[::-1]  # store bottom-up
    raster = rows.tobytes()
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + len(raster), 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h if not top_down else -h, 1, 24, 0,
        len(raster), 2835, 2835, 0, 0,
    )
    return header + dib + raster


def _expected_px(w: int, h: int):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 7) % 256, (y * 11) % 256, (x + y) % 256], axis=-1
    ).astype("uint8")


def test_real_decoder_ppm_and_bmp(spark):
    """The decoder='real' branch genuinely executes: PPM and BMP payloads
    report their true header dimensions; junk in the same batch falls back
    to the labeled fake without killing the Arrow batch."""
    from opc2mongodb_spark.multimodal.columns import MEDIA_SCHEMA

    rows = [
        (1, "image", bytearray(_ppm_bytes(37, 21)), ("s", "ppm")),
        (2, "image", bytearray(_bmp_bytes(16, 9)), ("s", "bmp")),
        (3, "image", bytearray(_bmp_bytes(16, 9, top_down=True)), ("s", "bmp")),
        (4, "image", bytearray(b"definitely not an image"), ("s", "junk")),
        (5, "audio", bytearray(b"audio bytes"), ("s", "wav")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_media(media).collect()}
    assert (got[1].width, got[1].height, got[1].decoder) == (37, 21, "real")
    assert (got[2].width, got[2].height, got[2].decoder) == (16, 9, "real")
    assert (got[3].width, got[3].height, got[3].decoder) == (16, 9, "real")
    assert got[4].decoder == "fake"
    assert got[5].decoder == "fake" and got[5].width == 0


def test_real_resize_nearest_neighbor(spark):
    """resizer='real': PPM/BMP payloads are decoded, nearest-neighbor
    resampled, and re-encoded as PPM with exactly the reference sampling;
    a corrupt payload in the same batch degrades to the fake, not a stage
    failure."""
    import numpy as np

    from opc2mongodb_spark.multimodal.columns import (
        MEDIA_SCHEMA,
        _parse_ppm,
        resize_images,
    )

    rows = [
        (1, "image", bytearray(_ppm_bytes(40, 24)), ("s", "ppm")),
        (2, "image", bytearray(_bmp_bytes(13, 7)), ("s", "bmp")),
        (3, "image", bytearray(b"corrupt payload"), ("s", "junk")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in resize_images(media, 10, 6).collect()}
    assert out[1].resizer == "real" and out[2].resizer == "real"
    assert out[3].resizer == "fake"
    for mid, (sw, sh) in ((1, (40, 24)), (2, (13, 7))):
        w, h, px = _parse_ppm(bytes(out[mid].payload))
        assert (w, h) == (10, 6)
        src = _expected_px(sw, sh)
        iy = (np.arange(6) * sh) // 6
        ix = (np.arange(10) * sw) // 10
        assert (px == src[iy][:, ix]).all()


def test_bmp_row_order_and_padding(spark):
    """Bottom-up vs top-down BMPs decode to the same top-down pixel array
    (the corner pixels differ, so row order is actually exercised)."""
    from opc2mongodb_spark.multimodal.columns import _parse_bmp

    up = _parse_bmp(_bmp_bytes(5, 3))[2]
    down = _parse_bmp(_bmp_bytes(5, 3, top_down=True))[2]
    assert (up == down).all()
    assert (up == _expected_px(5, 3)).all()


def _wav_bytes(n_samples: int, rate: int = 16000, n_ch: int = 1) -> bytes:
    """Minimal PCM16 RIFF/WAVE with a deterministic ramp payload."""
    import struct

    data = b"".join(
        struct.pack("<h", (i * 37) % 32768 - 16384)
        for i in range(n_samples * n_ch)
    )
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_real_decoder_wav(spark):
    """Audio payloads with a RIFF/WAVE header decode via the real stdlib
    chunk walk: n_frames carries the PCM sample-frame count, raster dims
    stay 0 per the audio schema contract; junk stays fake."""
    from opc2mongodb_spark.multimodal.columns import MEDIA_SCHEMA

    rows = [
        (1, "audio", bytearray(_wav_bytes(480)), ("s", "wav")),
        (2, "audio", bytearray(_wav_bytes(7, rate=8000, n_ch=2)), ("s", "wav")),
        (3, "audio", bytearray(b"not audio at all"), ("s", "junk")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_media(media).collect()}
    assert (got[1].n_frames, got[1].decoder) == (480, "real")
    assert (got[1].width, got[1].height) == (0, 0)
    assert (got[2].n_frames, got[2].decoder) == (7, "real")
    assert got[3].decoder == "fake"


def test_image_dhash_and_hamming_banding(spark):
    """r7: perceptual dHash over real PPM payloads + the factored
    64-bit banded hamming join. Identical images hash identically; a
    lightly-noised copy lands within a small hamming distance while a
    structurally different image lands far; the banded join over the
    dhash column finds exactly the pairs brute force finds (pigeonhole
    guarantee on a precomputed signature column); opaque payloads fall
    back to the labeled deterministic fake."""
    import numpy as np

    from opc2mongodb_spark.multimodal.columns import (
        _dhash_bytes,
        _encode_ppm,
        image_dhash,
    )
    from opc2mongodb_spark.operators.dedup import hamming_neardup_pairs

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    # strong horizontal gradient so dhash bits are stable under noise
    base[:, :, 0] = np.tile(np.arange(32, dtype=np.uint8) * 8, (32, 1))
    noised = base.copy()
    noised[:, :, 2] ^= rng.integers(0, 4, size=(32, 32), dtype=np.uint8)
    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    other[:, :, 0] = np.tile(np.arange(31, -1, -1, dtype=np.uint8) * 8, (32, 1))

    payloads = {
        1: _encode_ppm(base),
        2: _encode_ppm(base),     # byte-identical copy
        3: _encode_ppm(noised),   # near-dup
        4: _encode_ppm(other),    # different
        5: b"not an image",        # undecodable -> fake
    }
    hashes = {k: _dhash_bytes(v) for k, v in payloads.items()}
    assert all(s == "real" for _, s in list(hashes.values())[:4])
    assert hashes[5][1] == "fake"
    assert hashes[1][0] == hashes[2][0]

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(hashes[1][0], hashes[3][0]) <= 3
    assert ham(hashes[1][0], hashes[4][0]) > 10

    media = spark.createDataFrame(
        [(k, "image", bytearray(v)) for k, v in payloads.items()],
        "media_id long, kind string, payload binary",
    )
    sigs = image_dhash(media)
    rows = {r.media_id: (r.dhash, r.hasher) for r in sigs.collect()}
    assert rows[1] == rows[2]
    assert rows[5][1] == "fake"

    pairs = {
        (r.a_id, r.b_id): r.hamming
        for r in hamming_neardup_pairs(
            sigs, "media_id", "dhash", n_bands=4, max_hamming=3
        ).collect()
    }
    expect = {}
    ks = sorted(rows)
    for i, a in enumerate(ks):
        for b in ks[i + 1:]:
            h = ham(rows[a][0], rows[b][0])
            if h <= 3:
                expect[(a, b)] = h
    assert pairs == expect
    assert (1, 2) in pairs and pairs[(1, 2)] == 0
    assert (1, 3) in pairs


def test_hamming_neardup_pairs_matches_bruteforce_on_longs(spark):
    """The factored banded join equals brute force on arbitrary signed
    64-bit signatures (incl. negative longs — the unsigned top-band shift
    path)."""
    from opc2mongodb_spark.operators.dedup import hamming_neardup_pairs

    sigs_py = [
        (1, -1),
        (2, -2),                      # hamming(-1,-2)=1... bits differ in 1
        (3, 0),
        (4, 1),
        (5, 1),                       # identical pair
        (6, (1 << 63) - 1),
        (7, -(1 << 63)),
        (8, 0b111),
    ]
    df = spark.createDataFrame(sigs_py, "id long, sig long")
    got = {
        (r.a_id, r.b_id): r.hamming
        for r in hamming_neardup_pairs(
            df, "id", "sig", n_bands=4, max_hamming=3
        ).collect()
    }
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    expect = {}
    for i, (ia, sa) in enumerate(sigs_py):
        for ib, sb in sigs_py[i + 1:]:
            h = ham(sa, sb)
            if h <= 3:
                expect[(min(ia, ib), max(ia, ib))] = h
    assert got == expect, (got, expect)
