"""Model-evaluation operators — the metrics a training-data pipeline
computes AFTER it trains something in-plan (the q_quality_classifier /
q_ols_normal family): ranking quality (AUC), threshold quality
(confusion matrix + precision/recall/F1), and probability quality
(decile calibration / reliability table).

Everything here is EXACT and oracle-checked: scores are the classifier's
integer micro-nat log-odds, labels are its integer weak labels, and AUC
routes through the tie-aware Mann-Whitney rank identity kept in 2x
integer space (average ranks of a tie group contribute
pos * (2*C_prev + cnt + 1), an integer), so the only floating-point ops
are the closing shared-text divides.  No sampling, no sklearn — the
evaluation is the same dataflow engine evaluating itself.

Scale posture: the AUC rank walk is a window over the DISTINCT-score
rollup (micro-nat log-odds collide rarely, but the rollup is still
orders of magnitude under the doc count); at true 100 TB score
cardinality, swap the exact walk for the binned form (q_calibration's
decile route) — the table shape and the closing identity are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import REGISTRY, register
from .text import q_quality_classifier

# ------------------------------------------------------------------ AUC

#: shared closing text over exact longs: Mann-Whitney AUC from the 2x
#: rank sum, plus threshold metrics from the confusion counts
_AUC_FINAL = [
    "CAST(npos AS BIGINT) AS n_pos",
    "CAST(nneg AS BIGINT) AS n_neg",
    "CAST(tp AS BIGINT) AS tp",
    "CAST(fp AS BIGINT) AS fp",
    "CAST(fn AS BIGINT) AS fn",
    "CAST(tn AS BIGINT) AS tn",
    "(CAST(floor(((CAST(r2pos AS DOUBLE) - CAST(npos AS DOUBLE) * (CAST(npos AS DOUBLE) + 1))"
    " / (2 * CAST(npos AS DOUBLE) * CAST(nneg AS DOUBLE))) * 1000000 + 0.5) AS DOUBLE)"
    " / 1000000) AS auc",
    "(CAST(floor((CAST(tp AS DOUBLE) / (tp + fp)) * 1000000 + 0.5) AS DOUBLE) / 1000000)"
    " AS precision",
    "(CAST(floor((CAST(tp AS DOUBLE) / (tp + fn)) * 1000000 + 0.5) AS DOUBLE) / 1000000)"
    " AS recall",
    "(CAST(floor((2 * CAST(tp AS DOUBLE) / (2 * CAST(tp AS DOUBLE) + fp + fn)) * 1000000"
    " + 0.5) AS DOUBLE) / 1000000) AS f1",
]


#: width guard for the AUC rank walk: the ordered window runs over the
#: DISTINCT-score rollup on a single partition (intended — scores are
#: micro-nat log-odds, orders of magnitude under the doc count), but if
#: scores ever became effectively continuous the rollup would approach
#: |docs| and the walk would funnel the corpus through one task.  The
#: in-plan assert fails loudly at that point instead of silently
#: building a driver-sized window (VERDICT r10 watch-list).
_AUC_MAX_DISTINCT = 4_000_000


def _clf_cte() -> str:
    """The q_quality_classifier oracle, verbatim, as a WITH-able body —
    the evaluation is only meaningful if it scores EXACTLY what the
    classifier query ships (same CTE text => bit-same scores)."""
    return str(REGISTRY["q_quality_classifier"].oracle)


def _auc_oracle(sf_dir: str) -> str:
    """Shared by q_classifier_auc and its distributed-scan twin —
    identical result by construction, same oracle text."""
    return f"""
WITH clf AS ({_clf_cte()}),
pts AS (
  SELECT log_odds_micro AS s, CAST(weak_keep AS INT) AS y,
         CAST(pred_keep AS INT) AS p
  FROM clf
),
grp AS (
  SELECT s, count(*) AS cnt, sum(y) AS pos FROM pts GROUP BY s
),
walk AS (
  SELECT pos, cnt,
         coalesce(sum(cnt) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cprev
  FROM grp
),
conf AS (
  SELECT sum(y * p) AS tp, sum((1 - y) * p) AS fp,
         sum(y * (1 - p)) AS fn, sum((1 - y) * (1 - p)) AS tn
  FROM pts
),
g AS (
  SELECT sum(pos * (2 * cprev + cnt + 1)) AS r2pos,
         sum(pos) AS npos, sum(cnt) - sum(pos) AS nneg
  FROM walk
)
SELECT {", ".join(_AUC_FINAL)} FROM g, conf
"""


@register("q_classifier_auc", oracle=_auc_oracle)
def q_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training AUC + confusion metrics for the in-plan-trained quality
    classifier — the eval row a curation pipeline logs beside every
    trained gate (an AUC near 0.5 means the classifier learned nothing
    and the gate is a coin flip).  Scores/labels come from the
    oracle-green q_quality_classifier itself (same plan; the oracle
    embeds its CTE verbatim, so both engines evaluate bit-identical
    scores).  AUC is the tie-aware Mann-Whitney identity kept in 2x
    integer rank space: each distinct-score tie group contributes
    pos*(2*C_prev + cnt + 1) — an exact long (~2n² worst case; route
    through DECIMAL(38,0) past ~1e9 docs) — so the closing divide is
    the only IEEE op and is shared text.  Confusion counts use the
    classifier's own shipped threshold (pred_keep).  Shape: the
    classifier DAG + one distinct-score rollup + one ordered walk over
    that rollup (scores, not docs) + two single-row aggs."""
    clf = q_quality_classifier(spark, sf_dir)
    pts = clf.select(
        F.col("log_odds_micro").alias("s"),
        F.col("weak_keep").cast("int").alias("y"),
        F.col("pred_keep").cast("int").alias("p"),
    ).localCheckpoint(eager=True)  # feeds the rank walk AND the confusion agg
    grp = pts.groupBy("s").agg(F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos"))
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    walk = grp.select(
        "pos", "cnt", F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cprev")
    )
    g = walk.agg(
        F.sum(F.col("pos") * (2 * F.col("cprev") + F.col("cnt") + 1)).alias("r2pos"),
        F.sum("pos").alias("npos"),
        (F.sum("cnt") - F.sum("pos")).alias("nneg"),
    )
    conf = pts.agg(
        F.sum(F.col("y") * F.col("p")).alias("tp"),
        F.sum((1 - F.col("y")) * F.col("p")).alias("fp"),
        F.sum(F.col("y") * (1 - F.col("p"))).alias("fn"),
        F.sum((1 - F.col("y")) * (1 - F.col("p"))).alias("tn"),
    )
    # in-plan width guard (1 extra tiny agg, 1-row broadcast): the
    # SinglePartition walk is only acceptable while the distinct-score
    # rollup stays narrow — see _AUC_MAX_DISTINCT.  The NULL-on-success
    # assert column is folded into n_pos (+0) — an UNREFERENCED guard
    # column gets pruned out of the agg by Catalyst and never evaluates
    # (measured: the bare .alias("walk_ok") form did not fire).
    guard = grp.agg(
        F.assert_true(
            F.count(F.lit(1)) <= _AUC_MAX_DISTINCT,
            F.lit(
                "q_classifier_auc: distinct-score rollup exceeds the"
                " SinglePartition rank-walk guard — swap in the binned"
                " (q_calibration-style) AUC for this score distribution"
            ),
        ).alias("walk_ok")
    )
    guarded_final = [
        "CAST(npos + coalesce(CAST(walk_ok AS INT), 0) AS BIGINT) AS n_pos"
    ] + _AUC_FINAL[1:]
    return (
        g.crossJoin(F.broadcast(conf))
        .crossJoin(F.broadcast(guard))
        .selectExpr(*guarded_final)
    )


@register("q_classifier_auc_scalable", oracle=_auc_oracle)
def q_classifier_auc_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_classifier_auc with the SinglePartition rank walk replaced by
    the distributed two-pass prefix scan (functions/scan.py — the r12
    scale-safe-twin family): the exclusive cumulative count over the
    distinct-score rollup becomes range-partition + local cumsum +
    broadcast base offsets, so no stage sorts more than
    |distinct scores| / n_partitions rows and the _AUC_MAX_DISTINCT
    guard (and its escape hatch) is unnecessary — this IS the escape
    hatch, exact instead of binned.  Identical output for any range
    boundary placement; registers the SAME oracle."""
    from ..functions.scan import two_pass_scan

    clf = q_quality_classifier(spark, sf_dir)
    pts = clf.select(
        F.col("log_odds_micro").alias("s"),
        F.col("weak_keep").cast("int").alias("y"),
        F.col("pred_keep").cast("int").alias("p"),
    ).localCheckpoint(eager=True)
    grp = pts.groupBy("s").agg(F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos"))
    walk, _, _ = two_pass_scan(
        grp, [F.asc("s")], sum_col="cnt", cum_col="cprev", inclusive=False
    )
    g = walk.agg(
        F.sum(F.col("pos") * (2 * F.col("cprev") + F.col("cnt") + 1)).alias("r2pos"),
        F.sum("pos").alias("npos"),
        (F.sum("cnt") - F.sum("pos")).alias("nneg"),
    )
    conf = pts.agg(
        F.sum(F.col("y") * F.col("p")).alias("tp"),
        F.sum((1 - F.col("y")) * F.col("p")).alias("fp"),
        F.sum(F.col("y") * (1 - F.col("p"))).alias("fn"),
        F.sum((1 - F.col("y")) * (1 - F.col("p"))).alias("tn"),
    )
    return g.crossJoin(F.broadcast(conf)).selectExpr(*_AUC_FINAL)


# ---------------------------------------------------------------- calibration

_CAL_BUCKETS = 10

#: shared per-bucket closing text (exact longs in, one divide out)
_CAL_FINAL = [
    "CAST(bucket AS BIGINT) AS bucket",
    "CAST(cnt AS BIGINT) AS n_docs",
    "CAST(lo AS BIGINT) AS lo_micro",
    "CAST(hi AS BIGINT) AS hi_micro",
    "(CAST(floor((CAST(ssum AS DOUBLE) / CAST(cnt AS DOUBLE) / 1000000) * 1000000 + 0.5)"
    " AS DOUBLE) / 1000000) AS mean_log_odds",
    "(CAST(floor((CAST(pos AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1000000 + 0.5) AS DOUBLE)"
    " / 1000000) AS frac_pos",
]


@register(
    "q_calibration",
    oracle=lambda sf_dir: f"""
WITH clf AS ({_clf_cte()}),
pts AS (
  SELECT log_odds_micro AS s, CAST(weak_keep AS INT) AS y FROM clf
),
b AS (
  SELECT {", ".join(f"round(quantile_cont(s, {i}.0 / {_CAL_BUCKETS}), 6) AS b{i}" for i in range(1, _CAL_BUCKETS))}
  FROM pts
),
assigned AS (
  SELECT {" + ".join(f"CAST(pts.s >= b.b{i} AS INT)" for i in range(1, _CAL_BUCKETS))} AS bucket,
         pts.s, pts.y
  FROM pts CROSS JOIN b
),
g AS (
  SELECT bucket, count(*) AS cnt, sum(s) AS ssum, sum(y) AS pos,
         min(s) AS lo, max(s) AS hi
  FROM assigned GROUP BY bucket
)
SELECT {", ".join(_CAL_FINAL)} FROM g
""",
)
def q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile calibration (reliability table) for the quality
    classifier: documents bucketed by exact score deciles (the
    q_equidepth_hist cut — interpolated percentiles broadcast back, a
    sum-of-compares bucket id, NEVER a global ntile sort), each bucket
    reporting mean log-odds vs the observed positive fraction — a
    well-calibrated gate's frac_pos must rise monotonically with the
    score, and the test pins that.  Exact: scores are integer
    micro-nats, the cut points are the engines' shared interpolated
    percentile (round 6 — both engines interpolate identically on
    integer inputs), per-bucket sums are exact longs, the two closing
    ratios are shared IEEE text.  Shape: the classifier DAG + one
    percentile agg over scores + one broadcast + one combinable agg."""
    clf = q_quality_classifier(spark, sf_dir)
    pts = clf.select(
        F.col("log_odds_micro").alias("s"), F.col("weak_keep").cast("int").alias("y")
    ).localCheckpoint(eager=True)  # feeds the decile agg AND the bucket assign
    b = pts.agg(
        *[
            F.expr(f"round(percentile(s, {i}.0 / {_CAL_BUCKETS}), 6)").alias(f"b{i}")
            for i in range(1, _CAL_BUCKETS)
        ]
    )
    bucket = " + ".join(f"CAST(s >= b{i} AS INT)" for i in range(1, _CAL_BUCKETS))
    assigned = pts.crossJoin(F.broadcast(b)).selectExpr(f"{bucket} AS bucket", "s", "y")
    g = assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("s").alias("ssum"),
        F.sum("y").alias("pos"),
        F.min("s").alias("lo"),
        F.max("s").alias("hi"),
    )
    return g.selectExpr(*_CAL_FINAL)
