"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched Pandas functions via
``mapInPandas`` (north-star surface).

The decode step is STUBBED (this container has no image/audio libs):
``decode_image`` raises NotImplementedError unless a codec import
succeeds, and ``fake_decode_features`` provides a deterministic fake
used by tests — the Spark-side plumbing (schema, batch iteration,
partitioning, UDF signature) is real and is what this module
actually exercises.

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


def decode_image(content: bytes) -> "object":
    """Real decode — requires an imaging library, absent here."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(content))
    except ImportError as e:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decode requires PIL; this environment stubs it — "
            "use fake_decode_features for the plumbing path"
        ) from e


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


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, per-partition,
    no shuffle. The batch shape (pdf of content bytes) is exactly what
    a real decode/resize/frame-sample stage would consume."""

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
