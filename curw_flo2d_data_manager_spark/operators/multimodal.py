"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (this environment has no image/audio
libraries): ``decode_image_meta`` produces a deterministic fake
"decode" from the bytes, and ``resize_images`` / ``sample_frames``
raise ``NotImplementedError`` at the point where a real codec call
would go. Everything around the stub — schemas, batch iteration,
partitioning, UDF signatures — is real Spark plumbing and is tested.

Design for 100 TB of media:

* media rows are big → keep ``spark.sql.files.maxPartitionBytes``
  bounded and never ``collect``; all transforms are mapInPandas over
  Arrow batches so Python touches bytes zero-copy;
* metadata (width/height/codec/duration) lives in a sibling STRUCT
  column so filters on it prune parquet row groups without reading
  the blobs (parquet column projection keeps binary IO out of
  metadata-only queries).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_sha", StringType(), True),
        StructField("fake_mean_luma", LongType(), True),
    ]
)


def attach_binary_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap metadata computable without decode: byte length + sha256.

    Native expressions — no Python; this is the query most metadata
    scans need, and it never deserializes the blob in Python.
    """
    return df.withColumn("n_bytes", F.length(F.col(content_col)).cast("long")).withColumn(
        "content_sha", F.sha2(F.col(content_col), 256)
    )


def decode_image_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """'Decode' images with a deterministic fake (no codec available):
    mean byte value stands in for mean luma. Demonstrates the real
    mapInPandas batch shape for a decode stage."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf[content_col].map(lambda b: len(b) if b is not None else 0),
                    "content_sha": pdf[content_col].map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    # REAL decode goes here (PIL.Image.open(io.BytesIO(b))).
                    # Deterministic fake: mean byte value.
                    "fake_mean_luma": pdf[content_col].map(
                        lambda b: int(sum(b) / len(b)) if b else 0
                    ),
                }
            )
            yield out

    return df.select("media_id", content_col).mapInPandas(_decode, DECODED_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Placeholder for a real resize stage — schema/partitioning are
    final, the codec call is not available in this environment."""
    raise NotImplementedError(
        "image resize requires a codec library (PIL/opencv) not present "
        "in this environment; the mapInPandas plumbing mirrors "
        "decode_image_meta with a content-out schema"
    )


def sample_frames(df: DataFrame, every_ms: int) -> DataFrame:
    """Placeholder for video frame sampling (needs ffmpeg/pyav)."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg/pyav; plumbing mirrors "
        "decode_image_meta with one output row per sampled frame"
    )
