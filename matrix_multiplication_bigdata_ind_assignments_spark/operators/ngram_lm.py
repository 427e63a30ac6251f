"""Interpolated Kneser–Ney bigram language model (SURVEY.md §2.3 'text
analysis' class): the smoothing that actual LM-based quality filters
run (CCNet's KenLM is 5-gram modified-KN; this is the honest
distributed core at order 2) — absolute discounting with the
CONTINUATION-count unigram backoff, the distinguishing KN idea
(Kneser & Ney, ICASSP'95; Chen & Goodman, 1998 empirical study):

  P(w2|w1) = (c(w1,w2) − D)/c(w1·)
           + (D · N1+(w1·)/c(w1·)) · (N1+(·w2)/|bigram types|)

where N1+(w1·) = distinct continuations of w1, N1+(·w2) = distinct
left contexts of w2 (how many DIFFERENT phrases w2 completes — the
"Francisco problem": frequent-but-predictable words get small
continuation mass), D = 0.75 (the Chen–Goodman default).

Train = eval corpus (the q_lm_perplexity convention), so every scored
bigram has c ≥ 1 and the max(c−D, 0) guard is vacuous — stated, not
hidden.  Docs with fewer than two tokens have no bigrams and drop from
the output in BOTH engines.

Determinism contract (= q_lm_perplexity): per-TYPE log-probs quantize
to integer micro-nats (floor(ln(P)·1e6 + 0.5)) so every reduction is a
BIGINT sum — order-independent exactly; the probability expression
itself is parenthesized identically in both engines (identical integer
inputs → identical IEEE ops), with the same honest 1-ulp/floor-boundary
residual the unigram op documents.

At 100 TB: training is two map-side-combinable hash aggs over the
bigram stream (type counts; left-context rollup) — the model table is
BIGRAM-TYPE-sized, super-vocabulary but still far below the stream
(Heaps-law-ish growth in the pair space).  The scoring probe joins the
stream against that table on (w1, w2): broadcast while the model fits
(fixtures), degrading gracefully to a shuffled equi-join at real model
sizes — unlike the unigram table there is no pretending this always
broadcasts.  All corpus constants (|bigram types|) stay in-plan as
1-row broadcast crossJoins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load

_KN_D = 0.75  # absolute discount (Chen & Goodman's fixed-D baseline)


def doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) for consecutive non-empty whitespace tokens —
    array-native (one transform over the token array, no positional
    self-join)."""
    tl = docs.select(
        "doc_id", F.filter(F.split("text", " "), lambda t: t != "").alias("toks")
    )
    return (
        tl.where(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )


@register(
    "q_lm_kn_perplexity",
    oracle=f"""
WITH tl AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents
),
bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM tl, unnest(generate_series(1, len(toks) - 1)) AS u(i)
  WHERE len(toks) >= 2
),
bt AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
lc AS (SELECT w1, sum(cb) AS c1, count(*) AS nf FROM bt GROUP BY w1),
rc AS (SELECT w2, count(*) AS nb FROM bt GROUP BY w2),
bb AS (SELECT count(*) AS b FROM bt),
lp AS (
  SELECT bt.w1, bt.w2,
         CAST(floor(ln(
           ((bt.cb - {_KN_D}) / lc.c1)
           + (({_KN_D} * lc.nf / lc.c1) * (rc.nb / (SELECT b FROM bb)))
         ) * 1000000 + 0.5) AS BIGINT) AS lp_micro
  FROM bt JOIN lc ON bt.w1 = lc.w1 JOIN rc ON bt.w2 = rc.w2
),
perdoc AS (
  SELECT doc_id, count(*) AS n, sum(lp_micro) AS s
  FROM bg JOIN lp ON bg.w1 = lp.w1 AND bg.w2 = lp.w2
  GROUP BY doc_id
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_bigrams,
       floor((-CAST(s AS DOUBLE) / (n * 1000000.0)) * 1000000 + 0.5) / 1000000 AS avg_nll
FROM perdoc
""",
)
def q_lm_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram perplexity under an interpolated Kneser–Ney
    model trained on the corpus itself: type counts → left-context
    totals/continuation fans → discounted interpolated probabilities →
    integer micro-nat scoring — (doc_id, n_bigrams, avg_nll)."""
    bg = doc_bigrams(load(spark, sf_dir, "documents"))
    # bigram-TYPE table, read by three aggs + the probe: materialize once
    bt = (
        bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb")).localCheckpoint(eager=True)
    )
    lc = bt.groupBy("w1").agg(F.sum("cb").alias("c1"), F.count(F.lit(1)).alias("nf"))
    rc = bt.groupBy("w2").agg(F.count(F.lit(1)).alias("nb"))
    bb = bt.agg(F.count(F.lit(1)).alias("b"))
    p = (
        (F.col("cb") - F.lit(_KN_D)) / F.col("c1")
        + (F.lit(_KN_D) * F.col("nf") / F.col("c1")) * (F.col("nb") / F.col("b"))
    )
    lp = (
        bt.join(F.broadcast(lc), "w1")
        .join(F.broadcast(rc), "w2")
        .crossJoin(F.broadcast(bb))
        .select(
            "w1",
            "w2",
            F.floor(F.log(p) * 1e6 + F.lit(0.5)).cast("long").alias("lp_micro"),
        )
    )
    perdoc = (
        bg.join(F.broadcast(lp), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("lp_micro").alias("s"))
    )
    nll = F.floor(
        (-F.col("s").cast("double") / (F.col("n") * 1e6)) * 1e6 + F.lit(0.5)
    ) / 1e6
    return perdoc.select(
        "doc_id",
        F.col("n").cast("long").alias("n_bigrams"),
        nll.alias("avg_nll"),
    )
