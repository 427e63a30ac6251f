"""Corpus-assembly operators: decontamination and cross-source dedup.

Two steps every LLM training corpus goes through between crawling and
training.  Decontamination removes training documents that share n-grams
with an evaluation set (or the benchmark leaks into the model); cross-dump
dedup collapses documents that several sources re-crawled, keeping one
copy by source precedence.  Both reuse the dedup module's shingle
machinery and its portable md5 hash family, so they stay fully
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources import load
from .dedup import _shingle_rows, _SQL_SHINGLES


@register(
    "q_decontaminate",
    oracle=f"""
WITH sh AS ({_SQL_SHINGLES}),
hs AS (SELECT doc_id, CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h FROM sh),
ev AS (SELECT DISTINCT h FROM hs WHERE doc_id % 50 = 0),
tr AS (SELECT doc_id, h FROM hs WHERE doc_id % 50 <> 0)
SELECT tr.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_hit_shingles
FROM tr JOIN ev ON tr.h = ev.h
GROUP BY tr.doc_id
""",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination scan: training docs sharing ≥1 word-3-gram
    with the held-out set (doc_id % 50 == 0 stands in for the benchmark).
    The eval shingle set is tiny relative to the corpus — ~2% here, a few
    GB of hashes even at 100 TB — so it BROADCASTS and the scan over
    training shingles never shuffles; output is per-doc hit counts (the
    report a pipeline acts on).  Shingles ride the same 60-bit md5 prefix
    as the dedup family, keeping the check oracle-exact."""
    d = load(spark, sf_dir, "documents")
    hs = _shingle_rows(d).select(
        "doc_id",
        F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    ev = hs.where(F.col("doc_id") % 50 == 0).select("h").distinct()
    tr = hs.where(F.col("doc_id") % 50 != 0)
    return (
        tr.join(F.broadcast(ev), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_shingles"))
    )


_SQL_PREFIX_KEY = "array_to_string(list_filter(string_split(text, ' '), t -> t <> '')[1:3], ' ')"


@register(
    "q_dedup_cross_source",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, source, {_SQL_PREFIX_KEY} AS k,
         row_number() OVER (PARTITION BY {_SQL_PREFIX_KEY} ORDER BY source, doc_id) AS rn
  FROM documents
)
SELECT doc_id, source, k FROM keyed WHERE rn = 1
""",
)
def q_dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-dump dedup with source precedence: documents whose 3-token
    prefix collides (several sources re-crawling the same boilerplate)
    collapse to ONE survivor, chosen by (source, doc_id) order — the
    keep-the-canonical-dump rule.  One window over the key partition: the
    shuffle is by content key, so a key duplicated across every source
    still lands on one reducer — for mega-duplicated boilerplate keys,
    pre-aggregate per (key, source) first (same salting idea as
    q_skew_join_salted)."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    keyed = d.select(
        "doc_id", "source", F.array_join(F.slice(toks, 1, 3), " ").alias("k")
    )
    w = Window.partitionBy("k").orderBy("source", "doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "source", "k")
    )


@register(
    "q_window_ntile",
    oracle="""
SELECT o_orderkey,
       o_orderpriority,
       CAST(ntile(4) OVER w AS INTEGER) AS price_quartile,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist — the ranking-to-[0,1] window trio
    (quartile bucketing per order priority).  The orderBy carries the key
    as tiebreak so every rank is total; percent_rank and cume_dist are
    ratios of those exact integer ranks, so the doubles agree bit-for-bit
    across engines without rounding."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
