"""Multimodal columns (SURVEY.md §2.3 north-star): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` kernels.

The container has no image/audio libraries, so the decode step is a
clearly-marked deterministic fake (`_fake_decode`) behind an import-gate:
if PIL were present the same plumbing would run a real decode.  Everything
Spark-side — schema, partitioning, UDF signature, Arrow batch shape — is
real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import register
from ..sources import load

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("checksum", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture media table: each document's text bytes as an opaque payload
    plus typed metadata — the schema a real image/audio table would have."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("n_chars") % 640 + 16).cast("long").alias("width"),
        (F.col("n_chars") % 480 + 16).cast("long").alias("height"),
    )


def _fake_decode(payload: bytes) -> dict:
    """DETERMINISTIC FAKE of a media decode (no PIL/ffmpeg in container).

    Real path would be: Image.open(BytesIO(payload)) → resize → features.
    The fake derives stable pseudo-features from the raw bytes so the
    Spark-side plumbing (batching, schema, partitioning) is fully
    exercised and test-able.
    """
    s = 0
    for i, b in enumerate(payload):
        s = (s * 131 + b + i) % 1_000_003
    return {"byte_len": len(payload), "checksum": s, "n_frames": len(payload) % 30 + 1}


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract kernel: Arrow batches in, feature
    rows out.  One Python worker per partition, vectorized transfer; the
    pattern (not the fake kernel) is the 100 TB path for multimodal
    preprocessing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        if _HAVE_PIL:
            # Real decode would go here; deliberately not implemented in
            # this container.
            raise NotImplementedError("real media decode requires PIL — container has none")
        for pdf in batches:
            feats = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": feats.map(lambda f: f["byte_len"]),
                    "checksum": feats.map(lambda f: f["checksum"]),
                    "n_frames": feats.map(lambda f: f["n_frames"]),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


@register("q_multimodal_features", oracle=None)  # binary kernel → rows-only
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over the media table, then a per-modality
    rollup (count, avg byte length, distinct checksums)."""
    feats = decode_features(media_table(spark, sf_dir))
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.avg("byte_len"), 6).alias("avg_bytes"),
        F.countDistinct("checksum").alias("n_distinct_checksums"),
    )


@register("q_multimodal_frame_sample", oracle=None)  # binary kernel → rows-only
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling shape: for video rows, emit one row per sampled frame
    index (every 10th frame) — the explode-after-decode pattern."""
    feats = decode_features(media_table(spark, sf_dir)).where(F.col("media_type") == "video")
    return feats.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(10))).alias("frame_idx"),
        "checksum",
    )
