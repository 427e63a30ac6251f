"""Hybrid-retrieval rank fusion (SURVEY.md §2.3 'similarity search'
class): Reciprocal Rank Fusion — Cormack, Clarke & Büttcher, SIGIR'09
("Reciprocal rank fusion outperforms Condorcet and individual rank
learning methods") — over one DENSE and one SPARSE retriever.

The standard hybrid-search shape of an LLM data/RAG pipeline: an
embedding retriever (exact cosine, the q_cosine_topk primitive) and a
lexical retriever (token-set Jaccard over the document text) each
produce a per-query top-``depth`` ranked list; RRF fuses them with
score(d) = Σ_r 1/(rrf_k + rank_r(d)) and re-ranks.  Rank fusion needs
no score calibration between the two retrievers — only ranks — which
is why it is the default hybrid combiner in production search stacks.

Scale shape: the query set is bounded (vec_id < 10, the q_cosine_topk
convention) and BROADCAST everywhere; the corpus side never shuffles
for the dense scoring (broadcast crossJoin + per-query window) and the
sparse side is an inverted-index equi-join on the token (corpus tokens
⋈ broadcast query tokens → map-side-combinable intersection counts).
The per-query rank windows partition on query_id over candidate lists,
never the corpus (sparse candidates = docs sharing ≥1 query token;
dense scoring is the documented exact-retriever baseline — the ANN
family in operators/similarity.py is the 100 TB path for the dense
limb and composes with the same fusion step).

ORACLE-CHECKED end-to-end: both retrievers, the rank cutoffs, the RRF
sum (1/(60+rank), coalesced-then-added in a pinned order, rounded
12 dp) and the fused re-rank are expressed identically in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources import load
from .similarity import _N_QUERIES, _normed

_FUSE_DEPTH = 50  # per-retriever list depth feeding the fusion
_RRF_K = 60  # the SIGIR'09 constant: dampens the head, flattens the tail
_FUSE_TOPK = 10  # fused results returned per query


def _dense_ranks(spark: SparkSession, sf_dir: str, depth: int) -> DataFrame:
    """Exact-cosine per-query ranks (cos DESC, neighbor_id tie-break) —
    q_cosine_topk's plan at fusion depth: queries broadcast, corpus
    resident, one per-query window over the scored list."""
    n = _normed(load(spark, sf_dir, "embeddings"))
    q = n.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe"), F.col("nrm").alias("qn")
    )
    c = n.select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("ce"), F.col("nrm").alias("cn")
    )
    dot = F.aggregate(F.zip_with("qe", "ce", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", (dot / (F.col("qn") * F.col("cn"))).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("drk", F.row_number().over(w).cast("long"))
        .where(F.col("drk") <= depth)
        .select("query_id", "neighbor_id", "drk")
    )


def _sparse_ranks(spark: SparkSession, sf_dir: str, depth: int) -> DataFrame:
    """Token-set-Jaccard per-query ranks (jac DESC, neighbor_id
    tie-break) over candidates sharing ≥1 token with the query — the
    inverted-index retrieval shape: corpus (doc, token) pairs equi-join
    the BROADCAST query tokens, intersection counts are one map-side-
    combinable hash agg, set sizes join back as broadcast dims."""
    d = load(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .distinct()
    )
    sz = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    qt = toks.where(F.col("doc_id") < _N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "w"
    )
    inter = (
        toks.join(F.broadcast(qt), "w")
        .where(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", F.col("doc_id").alias("neighbor_id"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jac = (
        inter.join(sz.withColumnRenamed("doc_id", "neighbor_id"), "neighbor_id")
        .join(
            F.broadcast(
                sz.where(F.col("doc_id") < _N_QUERIES).select(
                    F.col("doc_id").alias("query_id"), F.col("sz").alias("qsz")
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            (F.col("c") / (F.col("sz") + F.col("qsz") - F.col("c"))).alias("jac"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("jac"), F.asc("neighbor_id"))
    return (
        jac.withColumn("srk", F.row_number().over(w).cast("long"))
        .where(F.col("srk") <= depth)
        .select("query_id", "neighbor_id", "srk")
    )


def rrf_fuse(
    dense: DataFrame, sparse: DataFrame, rrf_k: int = _RRF_K, topk: int = _FUSE_TOPK
) -> DataFrame:
    """Full-outer merge of two per-query rank lists → RRF score →
    per-query re-rank.  The score arithmetic is pinned (dense term +
    sparse term, each coalesced to 0.0 when the doc is absent from that
    list, rounded 12 dp) so both engines agree bit-for-bit."""
    fused = dense.join(sparse, ["query_id", "neighbor_id"], "full_outer").select(
        "query_id",
        "neighbor_id",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("drk")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("srk")), F.lit(0.0)),
            12,
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("neighbor_id"))
    return (
        fused.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= topk)
        .select("query_id", "neighbor_id", F.round("rrf", 6).alias("rrf"), "rk")
    )


_RRF_ORACLE = f"""
WITH n AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
dense AS (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS drk
  FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm) AS cos
    FROM n q JOIN n c ON q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
  )
),
dense_d AS (SELECT * FROM dense WHERE drk <= {_FUSE_DEPTH}),
toks AS (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> ''
),
sz AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
qt AS (SELECT doc_id AS query_id, w FROM toks WHERE doc_id < {_N_QUERIES}),
inter AS (
  SELECT qt.query_id, t.doc_id AS neighbor_id, count(*) AS c
  FROM toks t JOIN qt ON t.w = qt.w AND t.doc_id <> qt.query_id
  GROUP BY qt.query_id, t.doc_id
),
jac AS (
  SELECT i.query_id, i.neighbor_id, i.c / (s.sz + qs.sz - i.c) AS jac
  FROM inter i
  JOIN sz s ON i.neighbor_id = s.doc_id
  JOIN sz qs ON i.query_id = qs.doc_id
),
sparse AS (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY jac DESC, neighbor_id) AS BIGINT) AS srk
  FROM jac
),
sparse_d AS (SELECT * FROM sparse WHERE srk <= {_FUSE_DEPTH}),
fused AS (
  SELECT coalesce(d.query_id, s.query_id) AS query_id,
         coalesce(d.neighbor_id, s.neighbor_id) AS neighbor_id,
         round(coalesce(1.0 / ({_RRF_K} + d.drk), 0.0)
               + coalesce(1.0 / ({_RRF_K} + s.srk), 0.0), 12) AS rrf
  FROM dense_d d FULL JOIN sparse_d s
    ON d.query_id = s.query_id AND d.neighbor_id = s.neighbor_id
)
SELECT query_id, neighbor_id, round(rrf, 6) AS rrf, rk FROM (
  SELECT query_id, neighbor_id, rrf,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS BIGINT) AS rk
  FROM fused
) WHERE rk <= {_FUSE_TOPK}
"""


@register("q_rrf_fusion", oracle=_RRF_ORACLE)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval for the query set (vec_id/doc_id < 10): exact
    dense cosine ranks ⊕ sparse token-Jaccard ranks → Reciprocal Rank
    Fusion (1/(60+rank), SIGIR'09) → fused per-query top-10 — the
    rank-level combiner a RAG pipeline runs over its embedding and
    lexical retrievers, oracle-checked end-to-end."""
    return rrf_fuse(
        _dense_ranks(spark, sf_dir, _FUSE_DEPTH),
        _sparse_ranks(spark, sf_dir, _FUSE_DEPTH),
    )
