"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns + typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery (schemas, batch iteration, partition sizing)
is real and tested; the codec layer is stubbed because no image/audio
libraries exist in this container:

  * ``decode_image`` raises NotImplementedError unless
    ``deterministic_fake=True``, in which case it derives a fake
    (height, width, n_channels, features) from the content hash —
    stable across runs/engines, so pipelines are testable end-to-end.
  * A real deployment replaces ONLY ``_decode_bytes`` /
    ``_extract_features``; every Spark-facing surface is unchanged.

Design for 100 TB of media:
  * media bytes never pass through Python row-at-a-time — Arrow batches
    via mapInPandas (configure spark.sql.execution.arrow.maxRecordsPerBatch
    to bound batch memory for large blobs);
  * metadata-only transformations (filtering by size/format, routing)
    stay pure-Column and never deserialize the blob;
  * feature extraction emits fixed-length array<float> ready for the
    similarity operators in functions.similarity.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),      # png | jpg | wav | mp4 …
        T.StructField("size_bytes", T.LongType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 16


def _decode_bytes(content: bytes, fmt: str) -> tuple[int, int, int]:
    """STUB — real codec goes here (PIL/libav not in this container)."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in "
        "this environment; use deterministic_fake=True for pipeline tests"
    )


def _fake_decode(content: bytes) -> tuple[int, int, int]:
    """Deterministic fake: dims derived from the content hash."""
    h = hashlib.sha256(content or b"").digest()
    return 16 + h[0] % 1024, 16 + h[1] % 1024, (h[2] % 3) + 1


def _extract_features(content: bytes) -> list[float]:
    """Deterministic fake embedding from the content hash (stub for a
    real feature extractor); fixed FEATURE_DIM length."""
    h = hashlib.sha256(content or b"").digest()
    return [((h[i] / 255.0) * 2.0 - 1.0) for i in range(FEATURE_DIM)]


def decode_media(
    df: DataFrame, deterministic_fake: bool = False
) -> DataFrame:
    """media table → decoded metadata + features via mapInPandas.

    Arrow-batched: each partition streams pandas batches; the blob
    column is dropped on output so downstream stages shuffle only
    metadata + features.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, content, mtype in zip(
                pdf["media_id"], pdf["content"], pdf["media_type"]
            ):
                raw = bytes(content) if content is not None else b""
                if deterministic_fake:
                    h, w, c = _fake_decode(raw)
                else:
                    h, w, c = _decode_bytes(raw, mtype)  # raises: stub
                rows.append(
                    {
                        "media_id": media_id,
                        "media_type": mtype,
                        "height": h,
                        "width": w,
                        "n_channels": c,
                        "features": _extract_features(raw),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.mapInPandas(_batches, DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_nth: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: metadata-only projection computing
    which frame indices to decode (duration from size heuristic) —
    the blob untouched until the decode stage."""
    est_frames = (F.col("size_bytes") / 4096).cast("int")
    idx = F.sequence(
        F.lit(0), F.greatest(est_frames - 1, F.lit(0)), F.lit(every_nth)
    )
    return df.select(
        "media_id", "media_type", est_frames.alias("est_frames"),
        idx.alias("frame_indices"),
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only rollup — never deserializes content."""
    return df.groupBy("media_type", "format").agg(
        F.count("*").alias("n"),
        F.sum("size_bytes").alias("total_bytes"),
        F.avg("size_bytes").alias("avg_bytes"),
    )
