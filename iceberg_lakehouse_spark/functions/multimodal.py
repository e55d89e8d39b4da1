"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns + typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery (schemas, batch iteration, partition sizing)
is real and tested. The codec layer is resolved AT CALL TIME on the
driver (``_resolve_codec``):

  * Pillow importable → real decode: dims from ``Image.open`` and a
    4×4 grayscale mean-pool as the feature vector; a corrupt blob
    yields NULL dims/features instead of failing the job.
  * Pillow absent (this container) → deterministic fake derived from
    the content hash — stable across runs/engines, so pipelines are
    testable end-to-end; pass ``require_codec=True`` to get the
    honest ``NotImplementedError`` instead of the fallback.
  * ``codec=`` accepts any picklable ``(content, fmt) -> (h, w,
    channels, features|None)`` callable — resolution happens on the
    driver, so injected codecs ship to executors via cloudpickle.

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


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _pil_decode(content: bytes, fmt: str):
    """Real codec (executors re-import PIL): dims from the image
    header, features = 4×4 grayscale mean-pool (FEATURE_DIM floats in
    [-1, 1]). Corrupt/undecodable blobs → all-None, not an exception —
    at 100 TB a handful of bad blobs must not kill the job."""
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(content)) as img:
            w, h = img.size
            c = len(img.getbands())
            small = img.convert("L").resize((4, 4))
            feats = [(p / 255.0) * 2.0 - 1.0 for p in small.getdata()]
        return h, w, c, feats
    except Exception:  # noqa: BLE001 — corrupt blob → NULL row values
        return None, None, None, None


def _fake_decode(content: bytes, fmt: str):
    """Deterministic fake: dims + features derived from the content
    hash — stable across runs/engines for pipeline tests."""
    h = hashlib.sha256(content or b"").digest()
    feats = [((h[i] / 255.0) * 2.0 - 1.0) for i in range(FEATURE_DIM)]
    return 16 + h[0] % 1024, 16 + h[1] % 1024, (h[2] % 3) + 1, feats


def _resolve_codec(deterministic_fake: bool, require_codec: bool, codec):
    """Driver-time codec choice: explicit codec > forced fake > real
    PIL when importable > fake fallback (or NotImplementedError when
    ``require_codec``)."""
    if codec is not None:
        return codec
    if deterministic_fake:
        return _fake_decode
    if _pil_available():
        return _pil_decode
    if require_codec:
        raise NotImplementedError(
            "media decode requires Pillow, which is not importable in "
            "this environment; install it or use deterministic_fake=True"
        )
    return _fake_decode


def decode_media(
    df: DataFrame,
    deterministic_fake: bool = False,
    require_codec: bool = False,
    codec=None,
) -> DataFrame:
    """media table → decoded metadata + features via mapInPandas.

    Arrow-batched: each partition streams pandas batches; the blob
    column is dropped on output so downstream stages shuffle only
    metadata + features. The codec is resolved on the driver (see
    ``_resolve_codec``) and closed over, so a custom ``codec``
    callable ships to executors by value."""
    decode = _resolve_codec(deterministic_fake, require_codec, codec)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, content, mtype, fmt in zip(
                pdf["media_id"], pdf["content"], pdf["media_type"],
                pdf["format"],
            ):
                raw = bytes(content) if content is not None else b""
                # codecs dispatch on the FORMAT (png/wav/…), not the
                # media family — fall back to the family when a row
                # carries no format
                h, w, c, feats = decode(raw, fmt or mtype)
                rows.append(
                    {
                        "media_id": media_id,
                        "media_type": mtype,
                        "height": h,
                        "width": w,
                        "n_channels": c,
                        "features": feats,
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
