"""Deterministic sampling / splitting operators (training-data pipeline).

A 100 TB corpus is never consumed whole: pipelines subsample for ablations
and carve held-out splits.  `df.sample()` is RNG-seeded per partition, so
its output changes with partitioning — useless for reproducible pipelines
and impossible to oracle-check.  Every operator here instead derives its
decision from a content hash (the portable md5-prefix family used by the
dedup pipeline), so the same row lands in the same split on any cluster
layout, in any engine, forever — and each query is fully DuckDB-checked.

Scale posture: all three are single-pass narrow projections + filters (no
shuffle at all for the flat sample; one partial-aggregated shuffle for the
count summaries; a per-group window for the stratified variant whose
partition key is the stratum — the only shape that needs co-location).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources import load

# portable bucket-in-[0,100) from a key column: same value in Spark and
# DuckDB (md5 prefix → 32-bit int → mod), used by all three operators
_SQL_PCT = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"


def _pct(col) -> F.Column:
    return F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10).cast("long") % 100


@register(
    "q_sample_hash",
    oracle=f"""
SELECT doc_id, lang, n_chars
FROM documents WHERE {_SQL_PCT} < 10
""",
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample: keep rows whose doc_id hash-bucket < 10.

    The filter is a narrow per-row predicate — no shuffle, no RNG state;
    at 100 TB it composes with partition pruning and predicate pushdown
    like any other filter, and resampling with a different rate keeps
    every previously-sampled row (nested samples)."""
    d = load(spark, sf_dir, "documents")
    return d.where(_pct("doc_id") < 10).select("doc_id", "lang", "n_chars")


@register(
    "q_train_test_split",
    oracle=f"""
SELECT CASE WHEN {_SQL_PCT} < 80 THEN 'train'
            WHEN {_SQL_PCT} < 90 THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY split
""",
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by content hash, summarized per
    split.  Hash-based assignment is stable under re-runs, engine changes,
    and corpus growth (a doc's split never changes when other docs are
    added) — the property RNG splits lack."""
    d = load(spark, sf_dir, "documents")
    pct = _pct("doc_id")
    split = (
        F.when(pct < 80, F.lit("train")).when(pct < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "q_stratified_sample",
    oracle=f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {_SQL_PCT.replace("% 100", "")}, doc_id) AS rn
  FROM documents
) WHERE rn <= 20
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: exactly 20 docs per language, chosen by hash
    order (deterministic, unbiased w.r.t. document content).  The window
    partitions on the stratum — the per-group top-k shape that runs as a
    partial top-k per partition before the shuffle."""
    d = load(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )
