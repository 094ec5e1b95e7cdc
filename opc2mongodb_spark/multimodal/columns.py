"""Multimodal columns (north-star block): image/audio/video as opaque
``binary`` payloads + typed metadata, processed with Arrow-batched
``mapInPandas`` — the sanctioned Python hot path.

Spark-side plumbing is REAL and tested: schemas, partitioning, UDF
signatures, batch shapes. The codec boundary is layered (r5): Pillow if
importable, then REAL pure-stdlib/numpy codecs for two uncompressed
formats (PPM P6 and 24bpp BMP — parse, nearest-neighbor resize, re-encode),
then a clearly-marked deterministic fake, so pipelines are testable
end-to-end with the ``decoder='real'`` branch genuinely executing even
without image libs. Decode errors fall through the same chain — one
corrupt payload can never kill an Arrow batch. Swapping in
librosa/ffmpeg-style codecs touches only ``_decode_bytes``/``_resize_bytes``.

Scale notes: payloads stay in executor memory one Arrow batch at a time
(spark.sql.execution.arrow.maxRecordsPerBatch bounds peak memory — set it
low for large media). Nothing ever collects payloads to the driver; metadata
extraction projects payload bytes away as early as possible so downstream
shuffles move only small rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("source", T.StringType()),
            T.StructField("declared_format", T.StringType()),
        ])),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("decoder", T.StringType()),  # 'real' | 'fake'
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Derive a deterministic media frame from the documents table: the text
    bytes stand in for an encoded payload (schema/partitioning are what's
    under test; real pipelines read payloads from object-store parquet)."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.lit("synthetic/v1").alias("declared_format"),
        ).alias("meta"),
    )


# ---- real stdlib codecs (r5) ----------------------------------------------
# Two uncompressed formats parse with nothing but struct/numpy, so the
# ``decoder='real'`` branch genuinely executes in this container (the
# Pillow path stays first for compressed formats when the lib exists):
# PPM P6 (ASCII header + raw RGB24) and BMP (BITMAPINFOHEADER, 24bpp,
# uncompressed). Anything else raises ValueError and falls through.


def _parse_ppm(payload: bytes) -> tuple[int, int, "Any"]:
    """PPM P6 → (width, height, uint8[h, w, 3]). Raises ValueError."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header tokens (magic, width, height, maxval) separated by whitespace;
    # '#' comments run to end-of-line
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos : pos + 1]
        if c == b"#":
            pos = payload.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tokens.append(payload[pos:end])
            pos = end
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError as exc:
        raise ValueError("bad PPM header") from exc
    if w <= 0 or h <= 0 or maxval != 255:
        raise ValueError("unsupported PPM dims/maxval")
    pos += 1  # the single whitespace byte after maxval
    raster = payload[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return w, h, np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def _encode_ppm(arr: "Any") -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _parse_bmp(payload: bytes) -> tuple[int, int, "Any"]:
    """BMP (24bpp uncompressed, BITMAPINFOHEADER+) → (width, height,
    uint8[h, w, 3] RGB). Handles bottom-up (positive height) and top-down
    (negative) row order and 4-byte row padding. Raises ValueError."""
    import struct

    import numpy as np

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP unsupported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if w <= 0 or h_signed == 0 or bpp != 24 or compression != 0:
        raise ValueError("only 24bpp uncompressed BMP supported")
    h = abs(h_signed)
    stride = ((w * 3 + 3) // 4) * 4
    raster = payload[data_off : data_off + stride * h]
    if len(raster) != stride * h:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR → RGB
    if h_signed > 0:
        px = px[::-1]  # bottom-up storage → top-down array
    return w, h, px


def _parse_image(payload: bytes) -> tuple[int, int, "Any"]:
    """Dispatch on magic bytes; ValueError if no stdlib codec matches."""
    if payload[:2] == b"P6":
        return _parse_ppm(payload)
    if payload[:2] == b"BM":
        return _parse_bmp(payload)
    raise ValueError("no stdlib codec for payload")


def _parse_wav(payload: bytes) -> dict[str, int]:
    """RIFF/WAVE header → {n_channels, sample_rate, n_samples}. PCM only
    (format tag 1); the stdlib `wave` module could do this but a direct
    chunk walk keeps the parse allocation-free on large payloads (only the
    header bytes are touched — the data chunk is never read). Raises
    ValueError."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE" or len(payload) < 36:
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt " and size >= 16:
            tag, n_ch, rate = struct.unpack_from("<HHI", payload, pos + 8)
            bits = struct.unpack_from("<H", payload, pos + 22)[0]
            if tag != 1 or n_ch == 0 or bits % 8 != 0 or bits == 0:
                raise ValueError("only integer PCM WAVE supported")
            fmt = (n_ch, rate, bits)
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("missing fmt/data chunk")
    n_ch, rate, bits = fmt
    return {
        "n_channels": n_ch,
        "sample_rate": rate,
        "n_samples": data_size // (n_ch * bits // 8),
    }


def _decode_bytes(kind: str, payload: bytes) -> dict[str, Any]:
    """Codec boundary. Real decoders first — Pillow if importable, then the
    stdlib PPM/BMP parsers — falling back to a DETERMINISTIC FAKE derived
    from the payload hash (clearly labeled in ``decoder``). Decode errors
    (not just a missing lib) also fall through: one corrupt payload must
    never kill the Arrow batch."""
    if kind == "image":
        try:
            import io

            from PIL import Image  # noqa: F401 — not present in this container

            img = Image.open(io.BytesIO(payload))  # pragma: no cover - Pillow absent here
            return {  # pragma: no cover - Pillow absent here
                "width": img.width,
                "height": img.height,
                "n_frames": 1,
                "decoder": "real",
            }
        except ImportError:
            pass
        except Exception:  # pragma: no cover - Pillow absent here
            pass  # undecodable by Pillow — try the stdlib codecs
        try:
            w, h, _ = _parse_image(payload)
            return {"width": w, "height": h, "n_frames": 1, "decoder": "real"}
        except ValueError:
            pass
    if kind == "audio":
        try:
            wav = _parse_wav(payload)
            # audio has no raster dims (width/height stay 0 — the schema
            # contract test_decode_audio_has_no_dimensions asserts);
            # n_frames carries the PCM sample-frame count.
            return {
                "width": 0,
                "height": 0,
                "n_frames": wav["n_samples"],
                "decoder": "real",
            }
        except ValueError:
            pass
    # fake decode: dimensions derived from the content hash — stable, testable
    h = hashlib.sha1(payload).digest()
    return {
        "width": 64 + h[0] % 192 if kind != "audio" else 0,
        "height": 64 + h[1] % 192 if kind != "audio" else 0,
        "n_frames": 1 if kind == "image" else 1 + h[2] % 120,
        "decoder": "fake",
    }


def decode_media(media: DataFrame) -> DataFrame:
    """Payload → typed metadata via mapInPandas (Arrow batches, no
    row-at-a-time Python). Output drops the payload column — after this
    stage shuffles move only small metadata rows."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: worker
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "sha1": pdf["payload"].map(
                    lambda b: hashlib.sha1(bytes(b)).hexdigest()
                ),
            }
            decoded = [
                _decode_bytes(k, bytes(p))
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            out["width"] = pd.Series([d["width"] for d in decoded], dtype="int32")
            out["height"] = pd.Series([d["height"] for d in decoded], dtype="int32")
            out["n_frames"] = pd.Series(
                [d["n_frames"] for d in decoded], dtype="int32"
            )
            out["decoder"] = pd.Series([d["decoder"] for d in decoded])
            yield pd.DataFrame(out)

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Byte-histogram feature vector per payload — a REAL vectorized
    extractor (numpy over Arrow batches) standing where an image/audio
    embedding model would run. Shape contract matches model inference:
    array<double> of fixed dim, one row per media_id."""
    import numpy as np

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: worker
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float64")
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.mapInPandas(_feat, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resizer", T.StringType()),  # 'real' | 'fake'
    ]
)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize every image payload to (width, height) — the normalization
    step in front of any vision-model featurizer. Codec boundary follows
    the module pattern: tries Pillow, falls back to a DETERMINISTIC fake
    whose output bytes derive from the source hash + target dims (labeled
    in ``resizer``), so the pipeline — batch shapes, payload-in/payload-out
    schema, partition behavior — is testable end-to-end without image libs.

    Scale: payload-in/payload-out runs one Arrow batch at a time; peak
    executor memory is bounded by arrow.maxRecordsPerBatch x payload size,
    and non-image rows are filtered BEFORE the Python boundary so only
    image bytes cross it.
    """

    def _resize_bytes(payload: bytes) -> tuple[bytes, str]:  # pragma: worker
        try:
            import io

            from PIL import Image  # noqa: F401 — not present in this container

            img = Image.open(io.BytesIO(payload)).resize((width, height))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return buf.getvalue(), "real"
        except ImportError:
            pass
        except Exception:
            pass  # Pillow present but payload undecodable — try stdlib
        try:
            # real stdlib path: decode PPM/BMP, nearest-neighbor resample
            # via integer index sampling, re-encode as PPM P6 (the module's
            # canonical uncompressed output format)
            import numpy as np

            src_w, src_h, px = _parse_image(payload)
            iy = (np.arange(height) * src_h) // height
            ix = (np.arange(width) * src_w) // width
            return _encode_ppm(np.ascontiguousarray(px[iy][:, ix])), "real"
        except ValueError:
            # fake resize: deterministic bytes from (content hash, dims),
            # length proportional to the target raster so size-based
            # assertions behave like a real resizer's output
            seed = hashlib.sha1(
                payload + f"|{width}x{height}".encode()
            ).digest()
            n = max(1, (width * height) // 64)
            return (seed * (n // len(seed) + 1))[:n], "fake"

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: worker
        for pdf in batches:
            done = [_resize_bytes(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": [b for b, _ in done],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "resizer": [r for _, r in done],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        _resize, schema=RESIZED_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling stub: expands each video payload into frame
    *references* (media_id, frame_no) without decoding — the explode-style
    plumbing a real ffmpeg sampler plugs into."""
    decoded = decode_media(media)
    return (
        decoded.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_no"),
        )
    )


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("hasher", T.StringType()),
    ]
)


def _dhash_bytes(payload: bytes) -> tuple[int, str]:
    """64-bit difference hash of one image payload.

    Real path (PPM/BMP via the module's stdlib decoders): grayscale with
    the integer ITU-R 601 weights (77R + 150G + 29B) >> 8 — all-integer,
    so the hash is bit-deterministic across platforms — then a 9x8
    nearest-neighbor downsample (same integer index sampling as
    resize_images) and one bit per horizontal neighbor pair
    (left > right). Undecodable payloads fall back to a deterministic
    content-hash fake (labeled, like the resizer), keeping the pipeline
    runnable on opaque formats without image libs.
    """
    import numpy as np

    try:
        w, h, px = _parse_image(payload)
    except ValueError:
        seed = hashlib.sha1(payload + b"|dhash").digest()[:8]
        return int.from_bytes(seed, "big", signed=True), "fake"
    gray = (
        px[:, :, 0].astype(np.uint32) * 77
        + px[:, :, 1].astype(np.uint32) * 150
        + px[:, :, 2].astype(np.uint32) * 29
    ) >> 8
    iy = (np.arange(8) * h) // 8
    ix = (np.arange(9) * w) // 9
    g = gray[iy][:, ix]
    bits = (g[:, :-1] > g[:, 1:]).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # to signed 64-bit (Spark LongType)
    if val >= 1 << 63:
        val -= 1 << 64
    return val, "real"


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual (difference) hash per image — the image-side analogue of
    the text pipeline's simhash64: near-identical images (re-encodes,
    small crops, brightness shifts) land within a small Hamming distance,
    so image NEAR-DUP runs through exactly the machinery the corpus
    already has — band this column with
    ``operators.dedup.simhash_neardup_pairs``'s 4x16-bit banding (it
    accepts any 64-bit signature column) instead of any pairwise image
    comparison. Arrow-batched mapInPandas, image rows filtered BEFORE the
    Python boundary, one long per image out — the decode cost is paid
    once and the join side never touches pixels."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: worker
        for pdf in batches:
            done = [_dhash_bytes(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": pd.Series(
                        [v for v, _ in done], dtype="int64"
                    ),
                    "hasher": [s for _, s in done],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        _hash, schema=DHASH_SCHEMA
    )
