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
        # The real decode (Image.open(BytesIO(payload)) → resize →
        # features) would branch on _HAVE_PIL here; until that kernel is
        # written, the deterministic fake is the unconditional fallback so
        # the query works whether or not Pillow happens to be installed.
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


_PHASH_BANDS = 8  # 64-bit hash → 8 bands of 8 bits
_PHASH_MAX_HAMMING = 10


def phash_table(media: DataFrame) -> DataFrame:
    """Perceptual-hash kernel: decode each payload to an 8×8 luminance grid
    (deterministic fake — see _fake_decode), 2-D DCT it (one einsum per
    Arrow batch, no per-row Python), threshold the low-frequency block at
    its median → a 64-bit pHash.  Near-identical media differing in a few
    bytes land within a small Hamming distance — the image twin of
    SimHash."""
    import numpy as np

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_type", StringType()),
            StructField("phash", LongType()),
        ]
    )

    n = 8
    k = np.arange(n)
    # orthonormal DCT-II basis — fixed tiny matrix, baked into the closure
    D = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    D[0, :] = np.sqrt(1.0 / n)

    def kernel(batches):
        # Fake luminance decode is the unconditional fallback (see
        # decode_features): a real PIL path would branch on _HAVE_PIL here.
        for pdf in batches:
            grids = np.stack(
                [
                    np.resize(np.frombuffer(p, dtype=np.uint8), n * n).reshape(n, n)
                    for p in pdf["payload"]
                ]
            ).astype(np.float64)
            coeffs = np.einsum("ij,bjk,lk->bil", D, grids, D)  # batched 2-D DCT
            flat = coeffs.reshape(len(pdf), n * n)[:, 1:]  # drop DC term
            med = np.median(flat, axis=1, keepdims=True)
            bits = (flat > med).astype(np.uint64)[:, :64]
            weights = (np.uint64(1) << np.arange(63, dtype=np.uint64))[None, :]
            ph = (bits * weights).sum(axis=1).astype(np.int64)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_type": pdf["media_type"], "phash": ph}
            )

    return media.mapInPandas(kernel, schema=schema)


@register("q_multimodal_phash_dedup", oracle=None)  # binary kernel → rows-only
def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-dup via pHash + band LSH: candidates share one identical
    8-bit band of the 64-bit hash (a Hamming-≤{h} pair always shares a
    band when differing bits spread over ≤{h} of 8 bands — standard
    pigeonhole guarantee for ≤7 differing bits, probabilistic above);
    candidates are confirmed with an exact Hamming filter, JVM-side
    `bit_count(a XOR b)`.  The pair join is an equi-join on (band,
    band_key) — never all-pairs — mirroring q_dedup_minhash's shape on
    the media column."""
    ph = phash_table(media_table(spark, sf_dir)).localCheckpoint(eager=True)
    bands = ph.select(
        "doc_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("phash"), b * 8).bitwiseAND(F.lit(255))
                    for b in range(_PHASH_BANDS)
                ]
            )
        ).alias("band", "band_key"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    hamming = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            hamming.alias("hamming"),
        )
        .where(F.col("hamming") <= _PHASH_MAX_HAMMING)
        .distinct()
    )
