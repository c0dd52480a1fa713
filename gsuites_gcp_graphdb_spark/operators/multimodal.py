"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched Pandas functions via
``mapInPandas`` (north-star surface).

Decode: ``decode_image`` uses PIL when importable; without it, a
pure-Python toy PPM (P6) codec handles ``P6`` payloads, so the
feature path runs on REAL decoded pixels (header parse -> width/
height -> pixel bytes) even in this codec-less container. The
NotImplementedError branch remains only for genuinely undecodable
payloads (e.g. a JPEG with no PIL). ``fake_decode_features`` survives
as the format-agnostic plumbing fake for opaque payloads.

Scale notes: binary payloads ride in Arrow record batches;
``spark.sql.files.maxPartitionBytes`` bounds scan partitions, and
the mapInPandas operator is embarrassingly parallel (no shuffle).
Keep metadata in separate scalar columns so filters on it prune
parquet row groups WITHOUT reading the blobs (column pruning is the
whole game for multimodal tables).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("n_bytes", LongType(), True),
        StructField("source", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents fixture: utf-8
    bytes as the opaque payload + typed metadata columns. This is the
    schema/plumbing shape a real image table would have."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.octet_length(F.encode("text", "utf-8"))
        .cast("bigint")
        .alias("n_bytes"),
        F.col("source"),
    )


class DecodedImage:
    """Minimal decoded-image value: dimensions + raw RGB bytes."""

    __slots__ = ("width", "height", "pixels")

    def __init__(self, width: int, height: int, pixels: bytes):
        self.width = width
        self.height = height
        self.pixels = pixels


def encode_ppm(pixels: bytes, width: int = 16) -> bytes:
    """Toy binary-PPM (P6) encoder: ``P6\\n{w} {h}\\n255\\n`` header +
    raw RGB payload zero-padded to a whole number of pixel rows
    (h = ceil(len / 3w)). Pure Python, deterministic — the fixture
    side of the real-decode path."""
    row = 3 * width
    height = (len(pixels) + row - 1) // row
    padded = pixels + b"\x00" * (height * row - len(pixels))
    return f"P6\n{width} {height}\n255\n".encode("ascii") + padded


def decode_ppm(content: bytes) -> DecodedImage:
    """Toy binary-PPM (P6) decoder: parse the 3-field header, return
    the w*h*3 pixel bytes."""
    if not content.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval — whitespace-separated
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    width, height, _maxval = fields
    return DecodedImage(width, height, content[pos : pos + width * height * 3])


def decode_image(content: bytes) -> DecodedImage:
    """Decode an image payload to (width, height, pixels): PIL when
    importable, else the toy PPM codec for P6 payloads. Raises
    NotImplementedError only for payloads no available codec
    understands."""
    try:
        from PIL import Image
        import io

        img = Image.open(io.BytesIO(content)).convert("RGB")
        return DecodedImage(img.width, img.height, img.tobytes())
    except ImportError:
        if content is not None and content.startswith(b"P6"):
            return decode_ppm(content)
        raise NotImplementedError(
            "no codec for this payload: PIL is absent and the content "
            "is not toy-PPM (P6) — use fake_decode_features for "
            "opaque-payload plumbing"
        ) from None


def fake_decode_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decoder': first-bytes histogram. Stands in
    for a real feature extractor so the distributed plumbing is
    testable without codecs."""
    if content is None:
        return [0.0] * dim
    out = [0.0] * dim
    for i, byte in enumerate(content[:256]):
        out[byte % dim] += 1.0
    return out


def documents_as_ppm_media(docs: DataFrame, width: int = 16) -> DataFrame:
    """Synthesize an IMAGE media table whose payloads are real toy-PPM
    (P6) encodings of the document bytes — so the decode path parses
    an actual header and recovers actual pixels. Encoding runs in the
    same Arrow-batched mapInPandas shape a real transcode stage would
    use (per-partition, no shuffle)."""

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = [
                encode_ppm(t.encode("utf-8"), width) for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "content": content,
                    "media_type": ["image"] * len(pdf),
                    "n_bytes": [len(c) for c in content],
                    "source": pdf["source"],
                }
            )

    return docs.select("doc_id", "text", "source").mapInPandas(
        _enc, MEDIA_SCHEMA
    )


DECODED_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def pixel_features(img: DecodedImage, dim: int = 8) -> list[float]:
    """Feature vector from DECODED pixels: value-mod-``dim`` histogram
    over every pixel byte (padding rows included — they are pixels)."""
    out = [0.0] * dim
    for byte in img.pixels:
        out[byte % dim] += 1.0
    return out


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over OPAQUE payloads (no decode
    assumed): Arrow-batched, per-partition, no shuffle. The batch
    shape (pdf of content bytes) is exactly what a real decode/resize/
    frame-sample stage would consume."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fake_decode_features(c, dim)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return media.select("media_id", "content", "n_bytes").mapInPandas(
        _extract, FEATURE_SCHEMA
    )


def extract_decoded_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """The REAL decode path: ``decode_image`` each payload (PIL or toy
    PPM), emit (media_id, width, height, pixel-histogram features).
    Width/height exist only after a successful header parse — a green
    oracle row is proof the decode ran, not a byte-histogram echo.
    Same Arrow-batched mapInPandas shape as extract_features."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_image(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d.width for d in decoded],
                    "height": [d.height for d in decoded],
                    "features": [pixel_features(d, dim) for d in decoded],
                }
            )

    return media.select("media_id", "content").mapInPandas(
        _extract, DECODED_FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, stride: int = 64, frame: int = 16) -> DataFrame:
    """'Frame sampling' over the opaque payload: every stride-th
    16-byte slice — pure built-ins (substring on binary), no UDF, to
    show the non-Python path for byte-range ops."""
    # floor division, explicitly: cast-of-double truncates in Spark
    # but ROUNDS in other engines — int semantics keep oracles exact
    n_frames = F.floor(F.col("n_bytes") / stride).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    return media.select(
        "media_id",
        F.transform(
            idx, lambda i: F.substring(F.col("content"), i * stride + 1, frame)
        ).alias("frames"),
    )


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("phash", StringType(), True),
    ]
)


def average_hash(img: DecodedImage, grid: int = 8) -> str:
    """Perceptual average-hash (aHash — the classic pHash-family
    baseline): grayscale the decoded pixels, block-mean them onto a
    grid x grid lattice, threshold each cell against the global cell
    mean, and emit the bits as a hex digest (16 hex chars at
    grid=8). Pure integer arithmetic until one float mean — fully
    deterministic, and near-identical images (crops/noise under the
    block size) collide, which is the point."""
    w, h, px = img.width, img.height, img.pixels
    if w == 0 or h == 0 or not px:
        return "0" * (grid * grid // 4)
    cells = [[0, 0] for _ in range(grid * grid)]  # [sum, n]
    n_px = len(px) // 3
    for i in range(n_px):
        gray = (px[3 * i] + px[3 * i + 1] + px[3 * i + 2]) // 3
        x, y = i % w, i // w
        cy = min(y * grid // max(h, 1), grid - 1)
        cx = min(x * grid // max(w, 1), grid - 1)
        c = cells[cy * grid + cx]
        c[0] += gray
        c[1] += 1
    means = [(s / n) if n else 0.0 for s, n in cells]
    overall = sum(means) / len(means)
    bits = 0
    for m in means:
        bits = (bits << 1) | (1 if m > overall else 0)
    return format(bits, f"0{grid * grid // 4}x")


def perceptual_hashes(media: DataFrame, grid: int = 8) -> DataFrame:
    """mapInPandas aHash over decoded payloads — Arrow-batched,
    per-partition, no shuffle; the dedup key for near-identical
    media at 100 TB (hash once, group by 16-byte digest — never a
    pairwise image comparison)."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                img = decode_image(bytes(content))
                out.append(average_hash(img, grid))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "phash": out}
            )

    return media.select("media_id", "content").mapInPandas(
        _hash, PHASH_SCHEMA
    )
