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
