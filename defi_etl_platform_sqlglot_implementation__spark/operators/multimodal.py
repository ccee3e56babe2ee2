"""Multimodal column plumbing (scale extension).

Images/audio/video are opaque ``binary`` columns + typed metadata. The
Spark-side plumbing — schemas, Arrow batch shapes, ``mapInPandas``
signatures, partitioning — is real and tested; the actual media decode is
STUBBED (no imaging/audio libraries in this container): pass
``fake=True`` for a deterministic byte-derived feature extractor, or get a
clearly-marked ``NotImplementedError``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content", BinaryType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("mime", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_channels", LongType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def attach_binary(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  mime: str = "text/plain") -> DataFrame:
    """Treat a source column as an opaque media payload: binary + metadata."""
    content = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        content.alias("content"),
        F.octet_length(content).cast("long").alias("byte_len"),
        F.md5(content).alias("content_md5"),
        F.lit(mime).alias("mime"),
    )


def decode_features(media: DataFrame, fake: bool = False,
                    batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched media decode via ``mapInPandas``.

    Real decode is unavailable here (no pillow/ffmpeg in the container) and
    raises ``NotImplementedError``. ``fake=True`` derives deterministic
    pseudo-features from the raw bytes so the distributed plumbing (schema,
    batch shape, partition parallelism) is fully exercised.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decoding requires imaging libraries not present "
                    "in this environment; pass fake=True for the "
                    "deterministic byte-derived stub"
                )
            b = pdf["content"]
            n = b.map(len)
            first = b.map(lambda x: x[0] if len(x) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": n,
                    "width": n % 640 + 64,
                    "height": n % 480 + 48,
                    "n_channels": 3,
                    "mean_intensity": first / 255.0,
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 100) -> DataFrame:
    """Frame-sampling plumbing: explode one row per sampled 'frame' offset
    (deterministic stand-in for video frame extraction; pure column ops)."""
    n_frames = F.greatest(F.lit(1), (F.col("byte_len") / every_n_bytes).cast("long"))
    return media.select(
        "doc_id", "byte_len",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("byte_offset", F.col("frame_idx") * every_n_bytes)
