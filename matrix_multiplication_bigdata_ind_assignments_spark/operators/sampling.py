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


@register(
    "q_corpus_mix",
    oracle=f"""
WITH per_src AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars_s,
         CAST(1 + CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) % 4 AS BIGINT) AS w
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(sum(chars_s) AS BIGINT) AS totchars, CAST(sum(w) AS BIGINT) AS sumw
  FROM per_src
),
rates AS (
  SELECT source, chars_s, w,
         least(100, CAST(floor(100.0 * (w / sumw) * (0.5 * totchars) / chars_s) AS BIGINT)) AS pct_keep
  FROM per_src, tot
)
SELECT r.source AS source, r.pct_keep AS pct_keep,
       CAST(count(d.doc_id) AS BIGINT) AS n_kept,
       CAST(coalesce(sum(d.n_chars), 0) AS BIGINT) AS chars_kept
FROM rates r LEFT JOIN documents d
  ON d.source = r.source
 AND CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < r.pct_keep
GROUP BY r.source, r.pct_keep
""",
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing: re-weight sources to target proportions under a
    global character budget (here 50% of the corpus, weights derived
    deterministically from the source name) — the step that turns N
    crawled sources into ONE training mix with chosen ratios.

    Plan shape for 100 TB: one partial-aggregated pass computes
    per-source sizes (tiny result), the keep-rate table is derived
    driver-free in the plan and BROADCAST back onto the scan, and the
    mix itself is a narrow hash filter — the corpus is read once and
    never shuffled.  Keep decisions use the same portable md5 bucket as
    every sampler here, so growing one source never resamples another.
    The rate arithmetic is ordered identically in the DuckDB oracle so
    the floor() of the double product agrees bit-for-bit.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w = (
        F.lit(1)
        + F.regexp_extract("source", r"([0-9]+)$", 1).cast("long") % 4
    ).cast("long")
    per_src = d.groupBy("source").agg(F.sum("n_chars").cast("long").alias("chars_s")).withColumn("w", w)
    tot = per_src.agg(
        F.sum("chars_s").cast("long").alias("totchars"), F.sum("w").cast("long").alias("sumw")
    )
    rates = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "chars_s",
        F.least(
            F.lit(100),
            F.floor(
                F.lit(100.0)
                * (F.col("w") / F.col("sumw"))
                * (F.lit(0.5) * F.col("totchars"))
                / F.col("chars_s")
            ),
        ).cast("long").alias("pct_keep"),
    ).localCheckpoint(eager=True)  # 20 rows, used twice below (broadcast +
    # recovery join): without materializing, each use re-runs the
    # per_src→tot aggregate chain.  localCheckpoint, not .cache() — its
    # blocks are GC-scoped, no CacheManager entry outlives the query in
    # the driver's long-lived session
    # the mix: equi-join the broadcast rate table onto the scan, then a
    # narrow hash filter — the corpus-side plan is scan → BHJ → filter
    # with no shuffle.  Sources whose rate rounds to zero keep are
    # recovered by a tiny rates-side left join on the 20-row summary.
    mixed = d.join(F.broadcast(rates.drop("chars_s")), "source").where(
        _pct("doc_id") < F.col("pct_keep")
    )
    summary = mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("k_n"), F.sum("n_chars").cast("long").alias("k_chars")
    )
    return rates.join(summary, "source", "left").select(
        "source",
        "pct_keep",
        F.coalesce("k_n", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("k_chars", F.lit(0)).cast("long").alias("chars_kept"),
    )


_WSAMPLE_K = 50

# u in (0, 1]: 32-bit md5 prefix scaled — same arithmetic both engines
_SQL_U = "((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1) / 4294967296.0)"


@register(
    "q_sample_weighted",
    oracle=f"""
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
       round(ln({_SQL_U}) / n_chars, 6) AS key_score
FROM documents
ORDER BY ln({_SQL_U}) / n_chars DESC, doc_id
LIMIT {_WSAMPLE_K}
""",
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    each doc draws key = ln(u)/w with u from its content hash and weight
    w = n_chars; the global top-k by key is a w-weighted sample.  Fully
    deterministic (u is md5-derived, no RNG) → oracle-checked.  The top-k
    is orderBy+limit, which Spark executes as per-partition top-k +
    driver merge (TakeOrderedAndProject) — no global sort, no shuffle of
    the corpus."""
    d = load(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        + 1
    ) / F.lit(4294967296.0)
    key = F.log(u) / F.col("n_chars")
    return (
        d.select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("long").alias("weight"),
            F.round(key, 6).alias("key_score"),
            key.alias("_k"),
        )
        .orderBy(F.desc("_k"), F.asc("doc_id"))
        .limit(_WSAMPLE_K)
        .drop("_k")
    )


#: temperature-mixing budget: same half-corpus budget as q_corpus_mix
_MIXT_SHARES = [
    "CAST(floor(1000000.0 * chars_s / totchars + 0.5) AS DOUBLE) / 1000000 AS nat_share",
    "CAST(floor(1000000.0 * w_u / sumw + 0.5) AS DOUBLE) / 1000000 AS temp_share",
]


@register(
    "q_corpus_mix_temp",
    oracle=f"""
WITH per_src AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars_s FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(chars_s) AS BIGINT) AS totchars FROM per_src),
wts AS (
  SELECT source, chars_s, totchars,
         CAST(floor(sqrt(CAST(chars_s AS DOUBLE) / totchars) * 1000000 + 0.5) AS BIGINT) AS w_u
  FROM per_src, tot
),
s AS (SELECT CAST(sum(w_u) AS BIGINT) AS sumw FROM wts),
alloc AS (
  SELECT source, chars_s, totchars, w_u, sumw,
         (totchars // 2) * w_u // sumw AS base,
         ((totchars // 2) * w_u) % sumw AS rem
  FROM wts, s
),
fin AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
         (totchars // 2) - sum(base) OVER () AS leftover
  FROM alloc
)
SELECT source, chars_s, {", ".join(_MIXT_SHARES)},
       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc_chars
FROM fin
""",
)
def q_corpus_mix_temp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (τ = 0.5): sampling weight per
    source ∝ (size share)^τ — the standard multilingual/multi-source
    rule that upsamples small sources and downsamples dominant ones —
    with the half-corpus character budget apportioned EXACTLY by the
    largest-remainder method (floor allocations + the top remainders
    get the leftover units, deterministic (rem DESC, source)
    tie-break), so Σ alloc_chars equals the budget to the character.

    Cross-engine determinism: τ = 0.5 means pow is sqrt — correctly
    rounded under IEEE-754, unlike general pow — over a shared-text
    double divide, quantized to µunits before any further arithmetic;
    everything downstream (base, remainder, rank, leftover) is exact
    BIGINT.  Shape: one map-side-combinable per-source agg (the only
    corpus-sized pass), then dim-sized scalar joins and one window over
    the SOURCE table (tens of rows) — nothing past the first exchange
    scales with the corpus."""
    d = load(spark, sf_dir, "documents").select("source", "n_chars")
    per_src = d.groupBy("source").agg(F.sum("n_chars").cast("long").alias("chars_s"))
    tot = per_src.agg(F.sum("chars_s").cast("long").alias("totchars"))
    wts = per_src.crossJoin(F.broadcast(tot)).selectExpr(
        "source",
        "chars_s",
        "totchars",
        "CAST(floor(sqrt(CAST(chars_s AS DOUBLE) / totchars) * 1000000 + 0.5) AS BIGINT) AS w_u",
    )
    s = wts.agg(F.sum("w_u").cast("long").alias("sumw"))
    alloc = wts.crossJoin(F.broadcast(s)).selectExpr(
        "source",
        "chars_s",
        "totchars",
        "w_u",
        "sumw",
        "(totchars DIV 2) * w_u DIV sumw AS base",
        "((totchars DIV 2) * w_u) % sumw AS rem",
    )
    w = Window.orderBy(F.desc("rem"), F.asc("source"))
    fin = alloc.select(
        "*",
        F.row_number().over(w).alias("rk"),
        (
            F.expr("totchars DIV 2")
            - F.sum("base").over(Window.partitionBy())
        ).alias("leftover"),
    )
    return fin.selectExpr(
        "source",
        "chars_s",
        *_MIXT_SHARES,
        "CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc_chars",
    )
