"""Multimodal column operators (SURVEY §2.12, BASELINE.json north star).

Design: media are opaque ``binary`` payload columns (or object-store
pointers) plus a typed metadata struct.  Everything Spark-side — schema,
partitioning, Arrow batch shape, UDF signatures — is real and tested; only
the codec kernels are stubbed (image/audio libs are not in this container)
behind ``DeterministicFakeCodec`` / ``NotImplementedError`` with the exact
seams a real libjpeg/ffmpeg binding would fill.

Scale notes: payloads never shuffle unless the operator needs them —
metadata extraction projects the struct only; decode/resize run in
``mapInPandas`` so each Arrow batch holds a bounded number of payloads
(``spark.sql.execution.arrow.maxRecordsPerBatch`` controls peak memory).
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
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("uri", StringType()),  # object-store pointer alternative
    ]
)

REAL_CODECS_AVAILABLE = False  # flip when PIL/ffmpeg bindings exist


class DeterministicFakeCodec:
    """Stand-in decode kernel: deterministic pseudo-decode so the full
    distributed pipeline (batching, schema, partitioning) is testable.
    A real deployment replaces `decode` with the PIL/libjpeg call — the
    signature (bytes in, (w, h, channels, pixel_digest) out) is the seam."""

    @staticmethod
    def decode(payload: bytes) -> tuple[int, int, int, str]:
        if payload is None:
            return (0, 0, 0, "")
        digest = hashlib.sha256(payload).hexdigest()
        w = 16 + int(digest[:4], 16) % 1024
        h = 16 + int(digest[4:8], 16) % 1024
        return (w, h, 3, digest[:16])

    @staticmethod
    def resize(payload: bytes, w: int, h: int) -> bytes:
        if not REAL_CODECS_AVAILABLE:
            # deterministic fake: tag the payload with the target size
            return hashlib.sha256(payload + f"{w}x{h}".encode()).digest()
        raise NotImplementedError("real resize kernel not bundled")


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixel_digest", StringType()),
    ]
)


def decode_metadata(media: DataFrame) -> DataFrame:
    """Decode payloads → (media_id, width, height, channels, pixel_digest).

    mapInPandas: payloads stay in Arrow batches; Python touches each batch
    once.  At 100 TB this is the canonical decode stage — parallelism =
    input splits, no shuffle, no driver involvement."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [DeterministicFakeCodec.decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "pixel_digest": [d[3] for d in decoded],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, DECODED_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame offset.  The
    offsets come from metadata (duration), JVM-side via sequence+explode —
    the (stubbed) per-frame decode then runs batch-wise like
    :func:`decode_metadata`."""
    n_frames = F.least(
        F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    return media.select(
        "media_id",
        "payload",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
            )
        ).alias("frame_offset_ms"),
    )


def payload_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass: byte sizes and digests without decoding —
    the cheap scan that should never need Python."""
    return media.select(
        "media_id",
        "mime",
        F.length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha256"),
    )


def load_media_dir(spark, path: str, mime: str = "application/octet-stream"):
    """Pointer-to-object-store ingestion: read a directory of opaque files
    into the MEDIA_SCHEMA shape via Spark's binaryFile source.

    At 100 TB the `uri` column IS the payload for cold media — downstream
    stages decode from the store lazily; here binaryFile materializes
    payload + uri + length in one scan, split-parallel.
    """
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.col("content").alias("payload"),
        F.lit(mime).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.col("path").alias("uri"),
    )
