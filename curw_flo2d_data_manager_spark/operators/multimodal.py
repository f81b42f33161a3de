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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int, content_col: str = "content"
) -> DataFrame:
    """Resize stage with the REAL mapInPandas plumbing (schema, Arrow
    batch iteration, blob-in/blob-out) and only the codec call
    swapped: uses PIL when importable, else a deterministic
    stand-in (sha256 of bytes ∥ target dims) so pipelines and tests
    run codec-free with stable outputs. At scale this is the pattern:
    one Python worker per Arrow batch, blobs never hit the driver."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # real codec path — exercised wherever PIL exists
            import io

            from PIL import Image  # type: ignore

            def _do(b: bytes | None) -> bytes | None:
                if b is None:
                    return None
                img = Image.open(io.BytesIO(b)).resize((width, height))
                out = io.BytesIO()
                img.save(out, format="PNG")
                return out.getvalue()

        except ImportError:  # deterministic codec-free stand-in

            def _do(b: bytes | None) -> bytes | None:
                if b is None:
                    return None
                return hashlib.sha256(
                    b + f":{width}x{height}".encode()
                ).digest()

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": pdf[content_col].map(_do),
                    "mime": "image/png",
                    "width": width,
                    "height": height,
                }
            )

    return df.select("media_id", content_col).mapInPandas(_resize, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, every_ms: int, content_col: str = "content"
) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp
    (row-expanding mapInPandas — the real shape of a frame extractor).
    Frame count comes from ``meta.duration_ms``; the frame-grab call
    uses pyav/ffmpeg when importable, else a deterministic stand-in
    (sha256 of bytes ∥ timestamp) so the explode plumbing, schema, and
    batch behavior are fully testable codec-free."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import av  # type: ignore  # noqa: F401

            have_codec = True
        except ImportError:
            have_codec = False

        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "ts_ms": [],
                "frame": [],
            }
            for mid, blob, dur in zip(
                pdf["media_id"], pdf[content_col], pdf["duration_ms"]
            ):
                n = 0 if dur is None else int(dur) // every_ms + 1
                for i in range(n):
                    ts = i * every_ms
                    if blob is None:
                        frame = None
                    elif have_codec:  # real pyav frame grab would go here
                        raise NotImplementedError(
                            "pyav present but frame extraction not wired"
                        )
                    else:
                        frame = hashlib.sha256(
                            bytes(blob) + f"@{ts}".encode()
                        ).digest()
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(ts)
                    out["frame"].append(frame)
            yield pd.DataFrame(out)

    flat = df.select(
        "media_id", content_col, F.col("meta.duration_ms").alias("duration_ms")
    )
    return flat.mapInPandas(_sample, FRAME_SCHEMA)
