"""Data-profiling + shard-assignment operators (training-data pipeline).

Before a 100 TB corpus trains anything, it gets profiled (null/distinct
counts, moments, histograms, cross-column correlation) and sharded into
dataloader-sized units.  Everything here is a single scan plus one
partial-aggregated shuffle — profiling must never cost more than the
pipeline it guards — and every statistic is DETERMINISTIC: moments and
correlations are computed from exact fixed-point integer sums (the
``functions.numeric`` route), then finished with an identical IEEE double
expression in both engines, so results are bit-stable under any
partitioning and oracle-checkable (SURVEY.md §7 FP-reproducibility risk;
a distributed double stddev can differ per run — these cannot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import fx, sql_fx
from ..registry import register
from ..sources import load


@register(
    "q_null_profile",
    oracle="""
SELECT 'event_type' AS col_name, CAST(count(*) - count(event_type) AS BIGINT) AS n_null,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct
FROM events
UNION ALL
SELECT 'user_id', CAST(count(*) - count(user_id) AS BIGINT),
       CAST(count(DISTINCT user_id) AS BIGINT) FROM events
UNION ALL
SELECT 'value', CAST(count(*) - count(value) AS BIGINT),
       CAST(count(DISTINCT value) AS BIGINT) FROM events
""",
)
def q_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-quality profile: null count + exact distinct count per
    profiled column, emitted as one row per column (stack/unpivot of a
    single multi-aggregate pass — ONE scan for all columns, not one scan
    per column; at 100 TB swap the exact distincts for
    approx_count_distinct, the q_approx_distinct_users path)."""
    e = load(spark, sf_dir, "events")
    agg = e.agg(
        (F.count(F.lit(1)) - F.count("event_type")).alias("null_event_type"),
        F.countDistinct("event_type").alias("dist_event_type"),
        (F.count(F.lit(1)) - F.count("user_id")).alias("null_user_id"),
        F.countDistinct("user_id").alias("dist_user_id"),
        (F.count(F.lit(1)) - F.count("value")).alias("null_value"),
        F.countDistinct("value").alias("dist_value"),
    )
    return agg.select(
        F.expr(
            "stack(3, 'event_type', null_event_type, dist_event_type,"
            " 'user_id', null_user_id, dist_user_id,"
            " 'value', null_value, dist_value)"
        ).alias("col_name", "n_null", "n_distinct")
    )


# identical final-formula text in both engines: exact integer sums cast to
# double, then the same IEEE expression tree → bit-equal results
_STD_SQL = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       (CAST(sum({sql_fx('value')}) AS DOUBLE) / 1000000) / count(*) AS mean_raw,
       floor(sqrt(
         (CAST(sum({sql_fx('value')} * {sql_fx('value')}) AS DOUBLE)
          - CAST(sum({sql_fx('value')}) AS DOUBLE) * CAST(sum({sql_fx('value')}) AS DOUBLE) / count(*))
         / (count(*) - 1)) / 1000000 * 10000 + 0.5) / 10000 AS std_value
FROM events GROUP BY event_type
"""


@register(
    "q_summary_stats",
    oracle=f"""
SELECT event_type, n, floor(mean_raw * 10000 + 0.5) / 10000 AS mean_value, std_value
FROM ({_STD_SQL})
""",
)
def q_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe()-style moments per group — count, mean, sample stddev —
    from exact fixed-point sums (S, Q = Σfx, Σfx²; fx² ≤ 3.2e17 fits a
    long per row, the Σ goes through DECIMAL(38)), finished with the
    identical double expression in both engines.  Final rounding is
    floor(x·1e4 + 0.5)/1e4 — pure IEEE ops — because double `round()`
    itself disagrees between engines near .5 boundaries."""
    e = load(spark, sf_dir, "events")
    v = fx("value")
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s"),
        F.sum((v * v).cast("decimal(38,0)")).alias("q"),
    )
    s_d = F.col("s").cast("double") / 1e6
    q_d = F.col("q").cast("double")
    n_d = F.col("n").cast("double")
    var_u2 = (q_d - F.col("s").cast("double") * F.col("s").cast("double") / n_d) / (
        F.col("n") - 1
    )
    return agg.select(
        "event_type",
        "n",
        (F.floor(s_d / n_d * 1e4 + 0.5) / 1e4).alias("mean_value"),
        (F.floor(F.sqrt(var_u2) / 1e6 * 1e4 + 0.5) / 1e4).alias("std_value"),
    )


@register(
    "q_corr",
    oracle=f"""
WITH sums AS (
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum({sql_fx('l_quantity')}) AS DOUBLE) AS sx,
         CAST(sum({sql_fx('l_extendedprice')}) AS DOUBLE) AS sy,
         CAST(sum({sql_fx('l_quantity')} * {sql_fx('l_quantity')}) AS DOUBLE) AS sxx,
         CAST(sum({sql_fx('l_extendedprice')} * CAST({sql_fx('l_quantity')} AS DOUBLE)) AS DOUBLE) AS sxy,
         CAST(sum(CAST({sql_fx('l_extendedprice')} AS DOUBLE) * CAST({sql_fx('l_extendedprice')} AS DOUBLE)) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       floor((n * sxy - sx * sy) / sqrt(n * sxx - sx * sx) / sqrt(n * syy - sy * sy)
             * 10000 + 0.5) / 10000 AS corr_qty_price
FROM sums
""",
)
def q_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group, deterministically: the five power
    sums are exact where they fit integer range (Σx, Σy, Σx², Σx·y in
    fixed-point longs/decimals) and identically-computed doubles where
    they don't (Σy² — price² exceeds the long range, so BOTH engines sum
    the same IEEE product stream; the sum is then order-dependent in the
    last bits, which the 1e-4 floor-rounding absorbs).  `F.corr` itself
    is a distributed double reduction — per-run nondeterministic — which
    is why the pipeline recomputes it from sums instead."""
    l = load(spark, sf_dir, "lineitem")
    x = fx("l_quantity")
    y = fx("l_extendedprice")
    agg = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(38,0)")).cast("double").alias("sxx"),
        F.sum((y * x.cast("double")).cast("decimal(38,0)")).cast("double").alias("sxy"),
        F.sum(y.cast("double") * y.cast("double")).alias("syy"),
    )
    corr = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        / F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        (F.floor(corr * 1e4 + 0.5) / 1e4).alias("corr_qty_price"),
    )


@register(
    "q_hist_bucket",
    oracle="""
SELECT bucket, CAST(bucket * 30 AS DOUBLE) AS lo, n FROM (
  SELECT CAST(floor(value / 30) AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
) ORDER BY bucket
""",
)
def q_hist_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram (width 30 over events.value): bucket id from
    one floor-divide — a pure map-side expression, so the shuffle carries
    only ~20 (bucket, partial-count) rows per partition.  The profiling
    primitive that stays O(buckets), not O(rows), at any scale."""
    e = load(spark, sf_dir, "events")
    b = F.floor(F.col("value") / 30)
    return (
        e.groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("bucket", (F.col("bucket") * 30).cast("double").alias("lo"), "n")
        .orderBy("bucket")
    )


@register(
    "q_token_shards",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM toks
)
SELECT doc_id, lang, CAST(floor((cum_tokens - n_tokens) / 2000) AS BIGINT) AS shard
FROM cum
""",
)
def q_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard assignment: docs are packed in doc_id order into
    ~2000-token shards per language — shard = floor(tokens-before-me /
    budget), the contiguous-packing rule dataloaders expect.  The window
    partitions on lang, so the prefix sum parallelizes per language; for
    a single giant stratum, two-phase it (per-partition subtotal + scan)
    — same shape as SNIPPETS.md's distributed prefix sum."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return toks.select(
        "doc_id",
        "lang",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2000).alias("shard"),
    )


_Z_THRESHOLD = 2.5


@register(
    "q_zscore_outliers",
    oracle=f"""
WITH st AS (
  SELECT event_type,
         count(*) AS n,
         CAST(sum({sql_fx('value')}) AS DOUBLE) AS s,
         CAST(sum({sql_fx('value')} * {sql_fx('value')}) AS DOUBLE) AS q
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type AS event_type,
       floor(((e.value - (st.s / 1000000) / st.n)
              / (sqrt((st.q - st.s * st.s / st.n) / (st.n - 1)) / 1000000)) * 10000 + 0.5)
       / 10000 AS z
FROM events e JOIN st ON e.event_type = st.event_type
WHERE abs((e.value - (st.s / 1000000) / st.n)
          / (sqrt((st.q - st.s * st.s / st.n) / (st.n - 1)) / 1000000)) > {_Z_THRESHOLD}
""",
)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection (|z| > 2.5): group moments come
    from the exact fixed-point sums (same machinery as q_summary_stats),
    the tiny stats table broadcasts back onto the scan, and z is the
    identical IEEE expression in both engines — so even the threshold
    compare is bit-stable.  Two passes over events, one broadcast join,
    no shuffle of the fact stream."""
    e = load(spark, sf_dir, "events")
    v = fx("value")
    st = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast("double").alias("s"),
        F.sum((v * v).cast("decimal(38,0)")).cast("double").alias("q"),
    )
    mean = (F.col("s") / 1e6) / F.col("n")
    std = F.sqrt((F.col("q") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)) / 1e6
    z = (F.col("value") - mean) / std
    return (
        e.join(F.broadcast(st), "event_type")
        .where(F.abs(z) > _Z_THRESHOLD)
        .select("event_id", "event_type", (F.floor(z * 1e4 + 0.5) / 1e4).alias("z"))
    )


@register(
    "q_data_expectations",
    oracle="""
SELECT 'orders.o_orderkey unique' AS check_name,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'orders.o_totalprice positive',
       CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders.o_orderdate not null',
       CAST(count(*) - count(o_orderdate) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem.l_quantity in [1,50]',
       CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem.l_orderkey fk orders',
       CAST(count(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
""",
)
def q_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (the Deequ/great-expectations
    shape): uniqueness, range, completeness, and referential-integrity
    checks evaluated in one report — what gates a corpus drop before it
    reaches training.  Each check is a scan-level aggregate (the
    uniqueness check piggybacks count distinct; the FK check is a LEFT
    ANTI join that broadcasts the dim side here and shuffles co-partitioned
    at scale).  Violation counts, not booleans, so the report is
    engine-comparable and actionable."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")

    def row(name: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(name).alias("check_name"), F.col("n_violations").cast("long"))

    uniq = o.agg((F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n_violations"))
    pos = o.agg(
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("n_violations")
    )
    notnull = o.agg((F.count(F.lit(1)) - F.count("o_orderdate")).alias("n_violations"))
    qty = l.agg(
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1).otherwise(0)
        ).alias("n_violations")
    )
    fk = (
        l.join(o.select("o_orderkey"), l.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    return (
        row("orders.o_orderkey unique", uniq)
        .unionByName(row("orders.o_totalprice positive", pos))
        .unionByName(row("orders.o_orderdate not null", notnull))
        .unionByName(row("lineitem.l_quantity in [1,50]", qty))
        .unionByName(row("lineitem.l_orderkey fk orders", fk))
    )


#: winsorization bounds — the standard 5%/95% trim
_WINS_LO, _WINS_HI = 0.05, 0.95


@register(
    "q_winsorize",
    oracle=f"""
WITH b AS (
  SELECT event_type,
         round(quantile_cont(value, {_WINS_LO}), 6) AS lo,
         round(quantile_cont(value, {_WINS_HI}), 6) AS hi
  FROM events GROUP BY event_type
),
c AS (
  SELECT e.event_type, b.lo, b.hi,
         least(greatest(e.value, b.lo), b.hi) AS w,
         CASE WHEN e.value < b.lo THEN 1 ELSE 0 END AS is_lo,
         CASE WHEN e.value > b.hi THEN 1 ELSE 0 END AS is_hi
  FROM events e JOIN b ON e.event_type = b.event_type
)
SELECT event_type, any_value(lo) AS lo, any_value(hi) AS hi,
       CAST(sum(is_lo) AS BIGINT) AS n_clipped_lo,
       CAST(sum(is_hi) AS BIGINT) AS n_clipped_hi,
       round(CAST(sum({sql_fx('w')}) AS DOUBLE) / 1000000 / count(*), 6) AS win_avg
FROM c GROUP BY event_type
""",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-group statistics: values clipped to the exact
    [p05, p95] interpolated percentiles (the robust-mean preprocessing
    every metrics pipeline applies before averaging heavy-tailed
    measures), reporting the bounds, clip counts, and winsorized mean.
    Shape at scale: one percentile agg per group (the only sort-bearing
    stage, over groups not the stream), bounds broadcast back onto the
    scan, then one combinable agg — the fact stream never shuffles.
    Determinism: bounds are 6-dp-rounded doubles shared by both engines
    (the q_percentiles Spark-percentile ≡ DuckDB-quantile_cont
    equivalence); the clipped value is either a raw input double or a
    shared bound, so the fixed-point mean is order-proof."""
    e = load(spark, sf_dir, "events")
    b = e.groupBy("event_type").agg(
        F.expr(f"round(percentile(value, {_WINS_LO}), 6)").alias("lo"),
        F.expr(f"round(percentile(value, {_WINS_HI}), 6)").alias("hi"),
    )
    w = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    c = e.join(F.broadcast(b), "event_type").select(
        "event_type",
        "lo",
        "hi",
        fx(w).alias("wfx"),
        (F.col("value") < F.col("lo")).cast("long").alias("is_lo"),
        (F.col("value") > F.col("hi")).cast("long").alias("is_hi"),
    )
    return c.groupBy("event_type").agg(
        F.any_value("lo").alias("lo"),
        F.any_value("hi").alias("hi"),
        F.sum("is_lo").alias("n_clipped_lo"),
        F.sum("is_hi").alias("n_clipped_hi"),
        F.round(F.sum("wfx").cast("double") / 1e6 / F.count(F.lit(1)), 6).alias("win_avg"),
    )


#: MAD outlier threshold: |x - med| > 3 · 1.4826 · MAD (the consistency
#: constant that makes MAD estimate sigma under normality)
_MAD_K = 3 * 1.4826


@register(
    "q_mad_outliers",
    oracle=f"""
WITH med AS (
  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, m.med, abs(e.value - m.med) AS ad
  FROM events e JOIN med m ON e.event_type = m.event_type
),
mad AS (
  SELECT event_type, any_value(med) AS med,
         round(quantile_cont(ad, 0.5), 6) AS mad
  FROM dev GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       floor(abs(e.value - m.med) / (m.mad * {_MAD_K}) * 10000 + 0.5) / 10000 AS score
FROM events e JOIN mad m ON e.event_type = m.event_type
WHERE abs(e.value - m.med) > m.mad * {_MAD_K}
""",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier detection (|x − med| >
    3·1.4826·MAD): the ROBUST twin of q_zscore_outliers — a single
    pathological value can drag a mean/stddev gate arbitrarily far,
    but breaks median/MAD only past 50% contamination, which is why
    curation pipelines gate on MAD.  Two percentile aggs (median, then
    median of absolute deviations) with the tiny per-group stats
    broadcast back between them — the fact stream never shuffles.
    Determinism: both medians are 6-dp-rounded shared doubles
    (q_percentiles equivalence); the score and threshold compare are
    identical IEEE expressions in both engines."""
    e = load(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("round(percentile(value, 0.5), 6)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_id", "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("event_type").agg(
        F.any_value("med").alias("med"),
        F.expr("round(percentile(ad, 0.5), 6)").alias("mad"),
    )
    score = F.abs(F.col("value") - F.col("med")) / (F.col("mad") * _MAD_K)
    return (
        e.join(F.broadcast(mad), "event_type")
        .where(F.abs(F.col("value") - F.col("med")) > F.col("mad") * _MAD_K)
        .select(
            "event_id",
            "event_type",
            (F.floor(score * 1e4 + F.lit(0.5)) / 1e4).alias("score"),
        )
    )


@register(
    "q_join_profile",
    oracle="""
WITH l AS (SELECT o_orderkey AS k, count(*) AS c FROM orders GROUP BY o_orderkey),
r AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY l_orderkey),
j AS (
  SELECT coalesce(l.k, r.k) AS k,
         coalesce(l.c, 0) AS cl, coalesce(r.c, 0) AS cr
  FROM l FULL OUTER JOIN r ON l.k = r.k
)
SELECT CAST(sum(cl) AS BIGINT) AS n_left_rows,
       CAST(sum(cr) AS BIGINT) AS n_right_rows,
       CAST(count(CASE WHEN cl > 0 THEN 1 END) AS BIGINT) AS n_keys_left,
       CAST(count(CASE WHEN cr > 0 THEN 1 END) AS BIGINT) AS n_keys_right,
       CAST(count(CASE WHEN cl > 0 AND cr > 0 THEN 1 END) AS BIGINT) AS n_keys_both,
       CAST(sum(cl * cr) AS BIGINT) AS est_out_rows,
       CAST(max(cl) AS BIGINT) AS max_left_per_key,
       CAST(max(cr) AS BIGINT) AS max_right_per_key,
       CAST(max_by(k, cl * cr * 1000000000000 - k) AS BIGINT) AS top_key,
       CAST(max(cl * cr) AS BIGINT) AS top_key_out_rows
FROM j
""",
)
def q_join_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for orders⋈lineitem — the diagnostic a
    planner (or q_skew_join_auto's stat pass) reads BEFORE committing a
    shuffle strategy at 100 TB: per-side key cardinalities, the EXACT
    join output cardinality (Σ cl·cr — what AQE estimates from sketchy
    stats, computed here from two combinable count-aggs), per-key
    fan-out maxima, and the hottest key with its output contribution
    (deterministic argmax: contribution·1e12 − key, i.e. (contribution
    DESC, key ASC) packed into one long).  Shape: two
    map-side-combinable counts + one key-level full-outer join + a
    one-row closing agg — cost is O(distinct keys), never O(join
    output), which is the point of estimating before executing."""
    o = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cl"))
    )
    l = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cr"))
    )
    j = o.join(l, "k", "full_outer").select(
        "k",
        F.coalesce("cl", F.lit(0)).alias("cl"),
        F.coalesce("cr", F.lit(0)).alias("cr"),
    )
    return j.agg(
        F.sum("cl").alias("n_left_rows"),
        F.sum("cr").alias("n_right_rows"),
        F.count(F.when(F.col("cl") > 0, 1)).alias("n_keys_left"),
        F.count(F.when(F.col("cr") > 0, 1)).alias("n_keys_right"),
        F.count(F.when((F.col("cl") > 0) & (F.col("cr") > 0), 1)).alias("n_keys_both"),
        F.sum(F.col("cl") * F.col("cr")).alias("est_out_rows"),
        F.max("cl").alias("max_left_per_key"),
        F.max("cr").alias("max_right_per_key"),
        F.expr("max_by(k, cl * cr * 1000000000000 - k)").alias("top_key"),
        F.max(F.col("cl") * F.col("cr")).alias("top_key_out_rows"),
    )


@register(
    "q_cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(date_trunc('day', ts)) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY event_type, day
),
tot AS (
  SELECT event_type, sum(c) AS t, count(*) AS d FROM daily GROUP BY event_type
),
pre AS (
  SELECT daily.event_type, daily.day,
         row_number() OVER w AS i,
         sum(daily.c) OVER (PARTITION BY daily.event_type ORDER BY daily.day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
         tot.t, tot.d
  FROM daily JOIN tot ON daily.event_type = tot.event_type
  WINDOW w AS (PARTITION BY daily.event_type ORDER BY daily.day)
),
s AS (
  SELECT event_type, day, d * p - i * t AS sc, d, t
  FROM pre
)
SELECT event_type,
       CAST(max_by(day, abs(sc) * 100000 - day) AS BIGINT) AS change_day,
       CAST(max(abs(sc)) AS BIGINT) AS cusum_scaled,
       CAST(any_value(d) AS BIGINT) AS n_days
FROM s GROUP BY event_type
""",
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over per-type daily event volumes:
    the day maximizing |Σ_{i≤t}(c_i − mean)| — the standard level-shift
    detector a pipeline runs on ingest volumes (a source going dark or
    doubling shows up as the CUSUM peak).  All-integer: the cumulative
    deviation is scaled by n_days (S'_t = D·prefix_t − t·T), so no
    rational mean ever materializes and the argmax — packed
    (|S'|·1e5 − day), i.e. (magnitude DESC, day ASC) — is exact in
    both engines.  Shape: one combinable daily-count agg, one
    broadcast of the per-type totals, one per-type ordered window
    (prefix sum over DAYS, not events), one closing argmax agg."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp(F.date_trunc("DAY", F.col("ts"))) / 86400)
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = daily.groupBy("event_type").agg(
        F.sum("c").alias("t"), F.count(F.lit(1)).alias("d")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    pre = daily.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "day",
        F.row_number().over(w).alias("i"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("p"),
        "t",
        "d",
    )
    s = pre.select(
        "event_type", "day", (F.col("d") * F.col("p") - F.col("i") * F.col("t")).alias("sc"), "d"
    )
    return s.groupBy("event_type").agg(
        F.expr("max_by(day, abs(sc) * 100000 - day)").cast("long").alias("change_day"),
        F.max(F.abs(F.col("sc"))).cast("long").alias("cusum_scaled"),
        F.any_value("d").cast("long").alias("n_days"),
    )


#: drift split point: the fixture's event month cut in half — first
#: half is the REFERENCE distribution, second half the CURRENT one
_DRIFT_SPLIT = "2024-01-16 00:00:00"

#: decile bound columns b1..b9 (exact shared 6-dp doubles from the
#: reference half), bucket = how many bounds the value clears (0..9)
_PSI_BUCKET = " + ".join(f"CAST(value >= b{i} AS INT)" for i in range(1, 10))

#: Laplace-smoothed PSI term per bucket, nano-quantized so the per-type
#: sum is an exact integer reduction (10 doubles summed in arbitrary
#: order would be partition-dependent):
#: term = (p - q) * ln(p / q), p = (cr+1)/(nr+10), q = (cc+1)/(nc+10)
#: NOTE the CAST-first shape: Spark parses the literal 1.0 as
#: DECIMAL(2,1), so `cr + 1.0` over a LONG runs DECIMAL division
#: (~2e-8 relative error vs IEEE) while DuckDB promotes to DOUBLE —
#: casting the count to DOUBLE before the +1 keeps both engines on the
#: same double arithmetic (found by a 45-nano hash mismatch at r10)
_PSI_TERM = (
    "CAST(floor((((CAST(cr AS DOUBLE) + 1) / (nr + 10) - (CAST(cc AS DOUBLE) + 1) / (nc + 10)) "
    "* ln(((CAST(cr AS DOUBLE) + 1) / (nr + 10)) / ((CAST(cc AS DOUBLE) + 1) / (nc + 10)))) "
    "* 1000000000 + 0.5) AS BIGINT)"
)


#: shared by q_psi_drift and its streaming twin q_stream_psi
#: (streaming/queries.py) — batch equivalence IS the streaming oracle,
#: the q_stream_funnel / q_stream_cohort pattern
PSI_ORACLE = f"""
WITH ref AS MATERIALIZED (
  SELECT event_type, value FROM events WHERE ts < TIMESTAMP '{_DRIFT_SPLIT}'
),
cur AS MATERIALIZED (
  SELECT event_type, value FROM events WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT}'
),
b AS MATERIALIZED (
  SELECT event_type,
         {", ".join(f"round(quantile_cont(value, 0.{i}), 6) AS b{i}" for i in range(1, 10))}
  FROM ref GROUP BY event_type
),
cnt AS (
  SELECT s.event_type, s.bucket, sum(s.is_ref) AS cr, sum(1 - s.is_ref) AS cc
  FROM (
    SELECT e.event_type, {_PSI_BUCKET} AS bucket, e.is_ref
    FROM (SELECT event_type, value, 1 AS is_ref FROM ref
          UNION ALL SELECT event_type, value, 0 FROM cur) e
    JOIN b ON e.event_type = b.event_type
  ) s GROUP BY s.event_type, s.bucket
),
spine AS (
  SELECT bg.event_type, bg.bucket, coalesce(cnt.cr, 0) AS cr, coalesce(cnt.cc, 0) AS cc
  FROM (SELECT b.event_type, g.bucket
        FROM b, (SELECT unnest(range(10)) AS bucket) g) bg
  LEFT JOIN cnt ON cnt.event_type = bg.event_type AND cnt.bucket = bg.bucket
),
tot AS (
  SELECT event_type, sum(cr) AS nr, sum(cc) AS nc FROM spine GROUP BY event_type
),
j AS (
  SELECT s.event_type, s.cr, s.cc, t.nr, t.nc
  FROM spine s JOIN tot t ON s.event_type = t.event_type
)
SELECT event_type,
       CAST(any_value(nr) AS BIGINT) AS n_ref,
       CAST(any_value(nc) AS BIGINT) AS n_cur,
       CAST(sum({_PSI_TERM}) AS DOUBLE) / 1000000000 AS psi
FROM j GROUP BY event_type
"""


@register("q_psi_drift", oracle=PSI_ORACLE)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor: events are split at
    the month's midpoint into reference/current halves, the CURRENT
    value distribution is binned against the REFERENCE deciles per
    event_type, and PSI = Σ (p−q)·ln(p/q) (Laplace-smoothed so empty
    buckets stay finite) — the standard went-my-feature-stale gate an
    ML pipeline runs on every refresh (PSI > 0.2 ⇒ investigate).
    Shape at scale: one percentile agg over the reference half (the
    tiny 9-bound table broadcasts back), ONE scan of both halves with
    the bucket as a narrow expression, a combinable (type, bucket)
    count agg over ≤ 10·|types| cells, and a spine join so absent
    buckets still contribute their smoothed term.  Each bucket's term
    is nano-quantized to an exact integer, so the per-type sum is
    order-proof; bounds are shared 6-dp doubles (the q_percentiles
    equivalence)."""
    e = load(spark, sf_dir, "events")
    is_ref = (F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp")).cast("int")
    ref = e.where(F.col("ts") < _DRIFT_SPLIT)
    b = ref.groupBy("event_type").agg(
        *[
            F.expr(f"round(percentile(value, 0.{i}), 6)").alias(f"b{i}")
            for i in range(1, 10)
        ]
    ).localCheckpoint(eager=True)  # read twice: bucketing join + spine
    cnt = (
        e.select("event_type", "value", is_ref.alias("is_ref"))
        .join(F.broadcast(b), "event_type")
        .select("event_type", F.expr(_PSI_BUCKET).alias("bucket"), "is_ref")
        .groupBy("event_type", "bucket")
        .agg(F.sum("is_ref").alias("cr"), F.sum(1 - F.col("is_ref")).alias("cc"))
    )
    spine = (
        b.select("event_type")
        .crossJoin(spark.range(10).select(F.col("id").cast("int").alias("bucket")))
        .join(cnt, ["event_type", "bucket"], "left_outer")
        .select(
            "event_type",
            "bucket",
            F.coalesce("cr", F.lit(0)).alias("cr"),
            F.coalesce("cc", F.lit(0)).alias("cc"),
        )
    )
    w = Window.partitionBy("event_type")
    scored = spine.select(
        "event_type",
        "cr",
        "cc",
        F.sum("cr").over(w).alias("nr"),
        F.sum("cc").over(w).alias("nc"),
    )
    return scored.groupBy("event_type").agg(
        F.any_value("nr").cast("long").alias("n_ref"),
        F.any_value("nc").cast("long").alias("n_cur"),
        (F.sum(F.expr(_PSI_TERM)).cast("double") / 1e9).alias("psi"),
    )


@register(
    "q_ks_drift",
    oracle=f"""
WITH e AS (
  SELECT event_type, value,
         CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 1 ELSE 0 END AS is_ref
  FROM events
),
v AS (
  SELECT event_type, value, sum(is_ref) AS cr, sum(1 - is_ref) AS cc
  FROM e GROUP BY event_type, value
),
c AS (
  SELECT event_type, value,
         sum(cr) OVER (PARTITION BY event_type ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumr,
         sum(cc) OVER (PARTITION BY event_type ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
  FROM v
),
t AS (SELECT event_type, sum(cr) AS nr, sum(cc) AS nc FROM v GROUP BY event_type)
SELECT c.event_type,
       CAST(any_value(t.nr) AS BIGINT) AS n_ref,
       CAST(any_value(t.nc) AS BIGINT) AS n_cur,
       CAST(max(abs(t.nc * c.cumr - t.nr * c.cumc)) AS BIGINT) AS d_scaled,
       floor(CAST(max(abs(t.nc * c.cumr - t.nr * c.cumc)) AS DOUBLE)
             / (any_value(t.nr) * any_value(t.nc)) * 1000000 + 0.5) / 1000000 AS d_stat
FROM c JOIN t ON c.event_type = t.event_type
GROUP BY c.event_type
""",
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic per event_type
    (same reference/current halves as q_psi_drift): D = max_x
    |F_ref(x) − F_cur(x)|, computed EXACTLY in integers as
    max |nc·cumref(x) − nr·cumcur(x)| over the merged value grid —
    no binning approximation, the nonparametric companion to PSI's
    binned view.  Shape: one (type, value) combinable count agg, one
    per-type ordered window over DISTINCT values (not events), one
    closing max agg; products stay ≤ nr·nc ≈ 2.5e7 at sf0.1, exact in
    longs.  d_stat = D/(nr·nc) is a single shared floor-text."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp")).cast("long").alias("is_ref"),
    )
    v = e.groupBy("event_type", "value").agg(
        F.sum("is_ref").alias("cr"), F.sum(1 - F.col("is_ref")).alias("cc")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = v.select(
        "event_type",
        "value",
        F.sum("cr").over(w).alias("cumr"),
        F.sum("cc").over(w).alias("cumc"),
        F.sum("cr").over(Window.partitionBy("event_type")).alias("nr"),
        F.sum("cc").over(Window.partitionBy("event_type")).alias("nc"),
    )
    d = F.abs(F.col("nc") * F.col("cumr") - F.col("nr") * F.col("cumc"))
    return c.groupBy("event_type").agg(
        F.any_value("nr").cast("long").alias("n_ref"),
        F.any_value("nc").cast("long").alias("n_cur"),
        F.max(d).cast("long").alias("d_scaled"),
        F.expr(
            "floor(CAST(max(abs(nc * cumr - nr * cumc)) AS DOUBLE)"
            " / (any_value(nr) * any_value(nc)) * 1000000 + 0.5) / 1000000"
        ).alias("d_stat"),
    )


_EQD_BUCKETS = 8


@register(
    "q_equidepth_hist",
    oracle=f"""
WITH b AS (
  SELECT event_type,
         {", ".join(f"round(quantile_cont(value, {i}.0 / {_EQD_BUCKETS}), 6) AS b{i}" for i in range(1, _EQD_BUCKETS))}
  FROM events GROUP BY event_type
),
assigned AS (
  SELECT e.event_type,
         {" + ".join(f"CAST(e.value >= b.b{i} AS INT)" for i in range(1, _EQD_BUCKETS))} AS bucket,
         e.value
  FROM events e JOIN b ON e.event_type = b.event_type
)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(min(value), 6) AS lo, round(max(value), 6) AS hi
FROM assigned GROUP BY event_type, bucket
""",
)
def q_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram per event_type ({b} buckets cut at the
    exact {b}-quantiles) — the statistics a cost-based optimizer and a
    range partitioner actually collect (equal-WIDTH histograms lie
    under skew; equal-DEPTH buckets bound every range-scan estimate by
    1/{b}).  One percentile agg per type (the only sort-bearing stage,
    over groups), bounds broadcast back, bucket id as a narrow
    sum-of-compares expression, one combinable closing agg with
    min/max bucket envelopes.  Counts per bucket are ~n/{b} by
    construction — the test pins that balance.""".replace(
        "{b}", str(_EQD_BUCKETS)
    )
    e = load(spark, sf_dir, "events")
    b = e.groupBy("event_type").agg(
        *[
            F.expr(f"round(percentile(value, {i}.0 / {_EQD_BUCKETS}), 6)").alias(f"b{i}")
            for i in range(1, _EQD_BUCKETS)
        ]
    )
    bucket = " + ".join(f"CAST(value >= b{i} AS INT)" for i in range(1, _EQD_BUCKETS))
    assigned = e.join(F.broadcast(b), "event_type").select(
        "event_type", F.expr(bucket).alias("bucket"), "value"
    )
    return assigned.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    ).select("event_type", F.col("bucket").cast("long").alias("bucket"), "n", "lo", "hi")


# ---------------------------------------------------------------- autocorr

#: shared final text: ACF ratio over exact integer sums (both engines
#: cast the same exact integers to DOUBLE and run one divide)
_ACF_RATIO = "(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))"
_ACF_LAGS = 3


@register(
    "q_autocorr",
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(date_trunc('day', ts)) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY event_type, day
),
tot AS (
  SELECT event_type, sum(c) AS t, count(*) AS d FROM daily GROUP BY event_type
),
dev AS (
  SELECT daily.event_type, daily.day,
         CAST(tot.d * daily.c - tot.t AS BIGINT) AS v
  FROM daily JOIN tot ON daily.event_type = tot.event_type
),
l AS (
  SELECT event_type, v,
         {", ".join(f"lag(v, {k}) OVER w AS v{k}" for k in range(1, _ACF_LAGS + 1))}
  FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
a AS (
  SELECT event_type, count(*) AS nd, sum(v * v) AS den,
         {", ".join(f"sum(v * v{k}) AS n{k}" for k in range(1, _ACF_LAGS + 1))}
  FROM l GROUP BY event_type
)
SELECT event_type, CAST(lag AS BIGINT) AS lag, CAST(nd AS BIGINT) AS n_days,
       {{rnd}} AS acf
FROM (
  {" UNION ALL ".join(f"SELECT event_type, nd, den, {k} AS lag, n{k} AS num FROM a" for k in range(1, _ACF_LAGS + 1))}
) WHERE den > 0
""".replace("{rnd}", "(CAST(floor((" + _ACF_RATIO + ") * 1000000 + 0.5) AS DOUBLE) / 1000000)"),
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..3 autocorrelation of the per-type DAILY event volume —
    the seasonality/burstiness diagnostic a pipeline runs before
    trusting any drift monitor (a strongly autocorrelated volume
    series makes naive day-over-day alerts fire on weekends).
    All-integer until the closing divide: deviations are scaled by
    n_days (v_i = D*c_i - T, so no rational mean materializes — the
    q_cusum_changepoint trick), lagged per type over DAYS (the window
    is over the tiny daily rollup, never the event stream), and the
    num/den sums are exact longs (|v| <= D*max_c ~ 1e6 at sf0.1,
    v^2 * days ~ 3e13; at corpus scales beyond ~1e9 route the sums
    through DECIMAL(38,0)).  Both engines finish with the same IEEE
    divide text.  Shape: one combinable daily-count agg, one broadcast
    of per-type totals, one per-type window over <=31 rows, one
    closing agg, a 3-way stack."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp(F.date_trunc("DAY", F.col("ts"))) / 86400)
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = daily.groupBy("event_type").agg(
        F.sum("c").alias("t"), F.count(F.lit(1)).alias("d")
    )
    dev = daily.join(F.broadcast(tot), "event_type").select(
        "event_type", "day", (F.col("d") * F.col("c") - F.col("t")).cast("long").alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = dev.select(
        "event_type",
        "v",
        *[F.lag("v", k).over(w).alias(f"v{k}") for k in range(1, _ACF_LAGS + 1)],
    )
    a = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum(F.col("v") * F.col("v")).alias("den"),
        *[F.sum(F.col("v") * F.col(f"v{k}")).alias(f"n{k}") for k in range(1, _ACF_LAGS + 1)],
    )
    stacked = a.selectExpr(
        "event_type",
        "nd",
        "den",
        "stack(%d, %s) AS (lag, num)"
        % (_ACF_LAGS, ", ".join(f"{k}, n{k}" for k in range(1, _ACF_LAGS + 1))),
    )
    return stacked.where(F.col("den") > 0).selectExpr(
        "event_type",
        "CAST(lag AS BIGINT) AS lag",
        "CAST(nd AS BIGINT) AS n_days",
        f"(CAST(floor(({_ACF_RATIO}) * 1000000 + 0.5) AS DOUBLE) / 1000000) AS acf",
    )


# ---------------------------------------------------------------- chi-square

#: shared per-cell chi-square term, quantized to micro units so the
#: cross-cell reduction is an exact integer sum in both engines; inputs
#: n, o, r, c are exact longs (n*o <= ~4e9 at sf0.1 — fits long; the
#: square routes through DOUBLE by design, one IEEE multiply)
_CHI2_TERM = (
    "CAST(floor(((CAST(n * o - r * c AS DOUBLE) * CAST(n * o - r * c AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))"
    " * 1000000 + 0.5) AS BIGINT)"
)
_CHI2_FINAL = [
    "CAST(n_docs AS BIGINT) AS n_docs",
    "CAST(n_langs AS BIGINT) AS n_langs",
    "CAST(n_sources AS BIGINT) AS n_sources",
    "CAST((n_langs - 1) * (n_sources - 1) AS BIGINT) AS dof",
    "(CAST(chi2_u AS DOUBLE) / 1000000) AS chi2",
    "(CAST(floor(sqrt((CAST(chi2_u AS DOUBLE) / 1000000)"
    " / (CAST(n_docs AS DOUBLE) * least(n_langs - 1, n_sources - 1)))"
    " * 1000000 + 0.5) AS DOUBLE) / 1000000) AS cramers_v",
]


@register(
    "q_chi2_independence",
    oracle=f"""
WITH o AS (SELECT lang, source, count(*) AS cnt FROM documents GROUP BY lang, source),
langs AS (SELECT lang, sum(cnt) AS r FROM o GROUP BY lang),
srcs AS (SELECT source, sum(cnt) AS c FROM o GROUP BY source),
n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM o),
cells AS (
  SELECT langs.lang, srcs.source, langs.r, srcs.c, n.n,
         CAST(coalesce(o.cnt, 0) AS BIGINT) AS o
  FROM langs CROSS JOIN srcs CROSS JOIN n
  LEFT JOIN o ON o.lang = langs.lang AND o.source = srcs.source
),
terms AS (SELECT {_CHI2_TERM} AS t FROM cells),
g AS (
  SELECT (SELECT n FROM n) AS n_docs,
         (SELECT count(*) FROM langs) AS n_langs,
         (SELECT count(*) FROM srcs) AS n_sources,
         sum(t) AS chi2_u
  FROM terms
)
SELECT {", ".join(_CHI2_FINAL)} FROM g
""",
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence for lang x source over the
    documents corpus (+ Cramer's V effect size) — the contingency
    diagnostic a curation pipeline runs to catch source/language
    coupling (one crawl dump collapsing to one language skews every
    downstream mix).  Includes EMPTY cells (expected-count mass where
    o=0), which a join on observed rows alone would drop.  Exactness:
    counts and marginals are exact longs; each cell's (N*o - r*c)^2 /
    (N*r*c) routes through the same DOUBLE text in both engines and is
    quantized to micro units, so the cross-cell reduction is an exact
    integer sum (order-proof).  Shape: one combinable contingency agg
    over R*C cells, two tiny marginal rollups broadcast back, an R x C
    cell frame (dims, not data), one closing single-row agg."""
    d = load(spark, sf_dir, "documents")
    o = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("cnt"))
    o = o.localCheckpoint(eager=True)  # tiny; scanned by 3 rollups + the cell join
    langs = o.groupBy("lang").agg(F.sum("cnt").alias("r"))
    srcs = o.groupBy("source").agg(F.sum("cnt").alias("c"))
    n = o.groupBy().agg(F.sum("cnt").cast("long").alias("n"))
    cells = (
        langs.crossJoin(F.broadcast(srcs))
        .crossJoin(F.broadcast(n))
        .join(o, ["lang", "source"], "left_outer")
        .select("lang", "source", "r", "c", "n", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("o"))
    )
    terms = cells.selectExpr(f"{_CHI2_TERM} AS t", "n", "r", "c")
    g = (
        terms.groupBy()
        .agg(
            F.any_value("n").alias("n_docs"),
            F.sum("t").alias("chi2_u"),
        )
        .crossJoin(F.broadcast(langs.groupBy().agg(F.count(F.lit(1)).alias("n_langs"))))
        .crossJoin(F.broadcast(srcs.groupBy().agg(F.count(F.lit(1)).alias("n_sources"))))
    )
    return g.selectExpr(*_CHI2_FINAL)


# ---------------------------------------------------------------- gini

#: shared closing text: Gini from exact rank/value sums
#: G = (2*S1 - (n+1)*S0) / (n*S0), S1 = sum(i*x) over the (x, doc_id)
#: total order, S0 = sum(x) — tie-order-invariant (equal x swap ranks
#: without changing S1)
_GINI_EXPR = (
    "(CAST(floor(((2 * CAST(s1 AS DOUBLE) - (CAST(n AS DOUBLE) + 1) * CAST(s0 AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(s0 AS DOUBLE))) * 1000000 + 0.5) AS DOUBLE) / 1000000)"
)


@register(
    "q_gini_tokens",
    oracle=f"""
WITH x AS (
  SELECT lang, doc_id,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS x
  FROM documents
),
rk AS (
  SELECT lang, x,
         row_number() OVER (PARTITION BY lang ORDER BY x, doc_id) AS i
  FROM x
),
g AS (SELECT lang, count(*) AS n, sum(x) AS s0, sum(i * x) AS s1 FROM rk GROUP BY lang)
SELECT lang, CAST(n AS BIGINT) AS n_docs, CAST(s0 AS BIGINT) AS total_tokens,
       {_GINI_EXPR} AS gini
FROM g WHERE s0 > 0
""",
)
def q_gini_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the per-document token-count distribution,
    per language — the corpus-concentration diagnostic (G -> 0: tokens
    spread evenly across documents; G -> 1: a few megadocs carry the
    corpus, so doc-level sampling under-represents the tail).  Exact:
    token counts are integers, ranks come from the (x, doc_id) total
    order (S1 = sum(i*x) is invariant under tie reordering), and the
    closing ratio is one shared IEEE text over exact long sums (i*x <=
    n*max_tokens ~ 1e7/row, summed ~2e11 at sf0.1 — fits long; route
    through DECIMAL(38,0) past ~1e9 docs/lang).  Shape: one narrow
    scan projecting (lang, x), one per-lang rank window (the sort is
    the rank's price — at extreme scale swap in the equi-depth
    histogram's quantile route), one combinable closing agg."""
    d = load(spark, sf_dir, "documents")
    x = d.select(
        "lang",
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).cast("long").alias("x"),
    )
    w = Window.partitionBy("lang").orderBy("x", "doc_id")
    rk = x.select("lang", "x", F.row_number().over(w).alias("i"))
    g = rk.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s0"),
        F.sum(F.col("i") * F.col("x")).alias("s1"),
    )
    return g.where(F.col("s0") > 0).selectExpr(
        "lang",
        "CAST(n AS BIGINT) AS n_docs",
        "CAST(s0 AS BIGINT) AS total_tokens",
        f"{_GINI_EXPR} AS gini",
    )


# ---------------------------------------------------------------- benford

#: Benford first-digit probabilities log10(1+1/d), fixed 9-dp literals
#: shared by both engines (never ln()/log10() at runtime — a 1-ulp libm
#: divergence would shift the quantized terms)
_BENFORD_P = {
    1: "0.301029996", 2: "0.176091259", 3: "0.124938737",
    4: "0.096910013", 5: "0.079181246", 6: "0.066946790",
    7: "0.057991947", 8: "0.051152522", 9: "0.045757491",
}

#: shared per-digit chi-square term (micro-quantized) and digit fraction
_BENFORD_TERM = (
    "CAST(floor(((CAST(o AS DOUBLE) - n * p) * (CAST(o AS DOUBLE) - n * p) / (n * p))"
    " * 1000000 + 0.5) AS BIGINT)"
)
_BENFORD_FINAL = [
    "CAST(digit AS BIGINT) AS digit",
    "CAST(o AS BIGINT) AS n_obs",
    "(CAST(floor((CAST(o AS DOUBLE) / n) * 1000000 + 0.5) AS DOUBLE) / 1000000) AS frac",
    "CAST(p AS DOUBLE) AS benford_frac",
    "(CAST(chi2_u AS DOUBLE) / 1000000) AS chi2",
]


@register(
    "q_benford",
    oracle=f"""
WITH src AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1
),
obs AS (SELECT digit, count(*) AS c FROM src GROUP BY digit),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM obs),
spine AS (
  SELECT d.digit, CAST({" ".join("WHEN d.digit = %d THEN %s" % (d, p) for d, p in _BENFORD_P.items()).join(["CASE ", " END"])} AS DOUBLE) AS p
  FROM (SELECT unnest(range(1, 10)) AS digit) d
),
cells AS (
  SELECT spine.digit, spine.p, tot.n, CAST(coalesce(obs.c, 0) AS BIGINT) AS o
  FROM spine CROSS JOIN tot LEFT JOIN obs ON obs.digit = spine.digit
),
terms AS (SELECT digit, o, p, n, {_BENFORD_TERM} AS t FROM cells),
g AS (SELECT digit, o, p, n, sum(t) OVER () AS chi2_u FROM terms)
SELECT {", ".join(_BENFORD_FINAL)} FROM g
""",
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    fabricated-data / generator-sanity screen a profiling pass runs on
    any money column (a synthetic generator that draws uniformly fails
    it loudly; real multiplicative processes follow log10(1+1/d)).
    Per digit 1-9: observed count (zero-count digits kept via a spine),
    observed vs Benford fraction, and the corpus chi-square.  Exact:
    the first digit comes from integer/string ops on floor(x) (no
    log10 binning), the Benford probabilities are fixed 9-dp literals
    shared by both engines (never runtime log), each chi-square term
    is micro-quantized so the 9-cell reduction is an exact integer
    sum.  Shape: one combinable digit-count agg, a 9-row spine, one
    9-row window — nothing scales past the first exchange."""
    o = load(spark, sf_dir, "orders")
    src = o.where(F.col("o_totalprice") >= 1).select(
        F.expr(
            "CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS BIGINT)"
        ).alias("digit")
    )
    obs = src.groupBy("digit").agg(F.count(F.lit(1)).alias("c"))
    tot = obs.agg(F.sum("c").cast("long").alias("n"))
    case = "CASE " + " ".join(
        f"WHEN digit = {d} THEN {p}" for d, p in _BENFORD_P.items()
    ) + " END"
    spine = spark.range(1, 10).select(
        F.col("id").alias("digit")
    ).selectExpr("digit", f"CAST({case} AS DOUBLE) AS p")
    cells = (
        spine.crossJoin(F.broadcast(tot))
        .join(obs, "digit", "left_outer")
        .select("digit", "p", "n", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("o"))
    )
    terms = cells.selectExpr("digit", "o", "p", "n", f"{_BENFORD_TERM} AS t")
    g = terms.select(
        "digit", "o", "p", "n", F.sum("t").over(Window.partitionBy()).alias("chi2_u")
    )
    return g.selectExpr(*_BENFORD_FINAL)


# ------------------------------------------------------------- higher moments

#: shared closing text: moments from exact centi-unit power sums
#: (n, s1..s4 arrive as exact integers CAST to DOUBLE identically; skew
#: and kurtosis are scale-invariant so the centi scale cancels)
_MOM_M2 = "(s2 / n - (s1 / n) * (s1 / n))"
_MOM_M3 = "(s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))"
_MOM_M4 = (
    "(s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n)"
    " - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))"
)
_MOM_FINAL = [
    "l_returnflag",
    "CAST(n AS BIGINT) AS n_rows",
    f"(CAST(floor((s1 / n / 100) * 1000000 + 0.5) AS DOUBLE) / 1000000) AS mean",
    f"(CAST(floor(sqrt({_MOM_M2}) / 100 * 1000000 + 0.5) AS DOUBLE) / 1000000) AS stddev_pop",
    f"(CAST(floor(({_MOM_M3} / sqrt({_MOM_M2} * {_MOM_M2} * {_MOM_M2})) * 1000000 + 0.5)"
    " AS DOUBLE) / 1000000) AS skewness",
    f"(CAST(floor(({_MOM_M4} / ({_MOM_M2} * {_MOM_M2}) - 3) * 1000000 + 0.5) AS DOUBLE)"
    " / 1000000) AS kurtosis",
]


@register(
    "q_higher_moments",
    oracle=f"""
WITH c AS (
  SELECT l_returnflag,
         CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS HUGEINT) AS c
  FROM lineitem
),
g AS (
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(c) AS DOUBLE) AS s1,
         CAST(sum(c * c) AS DOUBLE) AS s2,
         CAST(sum(c * c * c) AS DOUBLE) AS s3,
         CAST(sum(c * c * c * c) AS DOUBLE) AS s4
  FROM c GROUP BY l_returnflag
)
SELECT {", ".join(_MOM_FINAL)} FROM g WHERE {_MOM_M2} > 0
""",
)
def q_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third/fourth-moment profile (skewness + excess kurtosis) per
    return flag over extended price — what a range partitioner or a
    CBO reads beyond mean/stddev to anticipate skew (q_summary_stats'
    heavier sibling).  Determinism: per-row centi-units are exact
    half-up longs; the four power sums ride DECIMAL(38,0) in Spark /
    HUGEINT in DuckDB (c^4 ~ 1e28, sums ~ 1e34 — far inside both),
    i.e. EXACT integers, so the shared closing text computes the same
    IEEE doubles in both engines; skewness/kurtosis are scale-
    invariant so the centi scale cancels, mean/stddev divide it back
    out.  Shape: one scan, one map-side-combinable agg carrying 5
    numbers per group — the moment-sketch that costs the same at any
    N."""
    li = load(spark, sf_dir, "lineitem")
    c = li.select(
        "l_returnflag",
        F.expr("CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS DECIMAL(38,0))").alias("c"),
    )
    g = c.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("c").cast("double").alias("s1"),
        F.sum(F.expr("c * c")).cast("double").alias("s2"),
        F.sum(F.expr("c * c * c")).cast("double").alias("s3"),
        F.sum(F.expr("c * c * c * c")).cast("double").alias("s4"),
    )
    return g.where(F.expr(f"{_MOM_M2} > 0")).selectExpr(*_MOM_FINAL)


# ---------------------------------------------------------------- mutual info

#: shared per-cell MI term in micro-nats, micro-quantized for an exact
#: order-proof sum: (o/n) * ln(n*o / (r*c)); o=0 cells contribute 0 and
#: are excluded (lim x->0 x ln x = 0), so only observed cells appear
_MI_TERM = (
    "CAST(floor(((CAST(o AS DOUBLE) / n)"
    " * ln((CAST(n AS DOUBLE) * o) / (CAST(r AS DOUBLE) * c))) * 1000000 + 0.5) AS BIGINT)"
)
_MI_FINAL = [
    "CAST(n_docs AS BIGINT) AS n_docs",
    "CAST(n_cells AS BIGINT) AS n_cells",
    "(CAST(mi_u AS DOUBLE) / 1000000) AS mutual_info_nats",
]


@register(
    "q_mutual_info",
    oracle=f"""
WITH o AS (SELECT lang, source, count(*) AS cnt FROM documents GROUP BY lang, source),
langs AS (SELECT lang, sum(cnt) AS r FROM o GROUP BY lang),
srcs AS (SELECT source, sum(cnt) AS c FROM o GROUP BY source),
n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM o),
terms AS (
  SELECT {_MI_TERM} AS t
  FROM (
    SELECT o.cnt AS o, langs.r, srcs.c, n.n
    FROM o JOIN langs ON o.lang = langs.lang
           JOIN srcs ON o.source = srcs.source
           CROSS JOIN n
  )
)
SELECT {", ".join(_MI_FINAL)}
FROM (SELECT (SELECT n FROM n) AS n_docs, count(*) AS n_cells, sum(t) AS mi_u FROM terms)
""",
)
def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(lang; source) in nats — the effect-size
    companion to q_chi2_independence (chi2 answers 'is there coupling',
    MI answers 'how many bits of one does the other carry', the number
    a curation pipeline thresholds before stratifying its sample).
    Only OBSERVED cells contribute (x ln x -> 0), so no spine is
    needed; each cell's (o/n)ln(no/rc) term is micro-quantized for an
    exact integer reduction, and the ln inputs are bit-identical
    integer ratios in both engines (the micro-nat route's documented
    1-ulp residual risk applies).  Shape: one combinable contingency
    agg, two tiny marginal rollups broadcast back, one single-row
    closing agg."""
    d = load(spark, sf_dir, "documents")
    o = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("cnt"))
    o = o.localCheckpoint(eager=True)  # tiny; feeds marginals + cells
    langs = o.groupBy("lang").agg(F.sum("cnt").alias("r"))
    srcs = o.groupBy("source").agg(F.sum("cnt").alias("c"))
    n = o.groupBy().agg(F.sum("cnt").cast("long").alias("n"))
    cells = (
        o.join(F.broadcast(langs), "lang")
        .join(F.broadcast(srcs), "source")
        .crossJoin(F.broadcast(n))
        .selectExpr("cnt AS o", "r", "c", "n")
    )
    terms = cells.selectExpr(f"{_MI_TERM} AS t", "n")
    g = terms.groupBy().agg(
        F.any_value("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("t").alias("mi_u"),
    )
    return g.selectExpr(*_MI_FINAL)


# ---------------------------------------------------------------- anova

#: shared closing text: one-way ANOVA F over exact integer pieces —
#: ssb_q is the micro-quantized Σ S_w²/n_w (order-proof long sum), sq
#: the exact Σ c² over days, t/n the grand total/count; k = 7 weekdays
_ANOVA_SSB = "(CAST(ssb_q AS DOUBLE) / 1000000 - CAST(t AS DOUBLE) * t / n)"
_ANOVA_SST = "(CAST(sq AS DOUBLE) - CAST(t AS DOUBLE) * t / n)"
_ANOVA_F = (
    f"(CAST(floor((({_ANOVA_SSB} / (k - 1)) / (({_ANOVA_SST} - {_ANOVA_SSB}) / (n - k)))"
    " * 10000 + 0.5) AS DOUBLE) / 10000)"
)
_ANOVA_FINAL = [
    "event_type",
    "CAST(n AS BIGINT) AS n_days",
    "CAST(k AS BIGINT) AS n_groups",
    f"{_ANOVA_F} AS f_stat",
    f"(CAST(floor(({_ANOVA_SSB} / {_ANOVA_SST}) * 1000000 + 0.5) AS DOUBLE) / 1000000)"
    " AS eta_sq",
]


@register(
    "q_anova_weekday",
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(date_trunc('day', ts)) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY event_type, day
),
grp AS (
  SELECT event_type, day % 7 AS wd, sum(c) AS sw, count(*) AS nw
  FROM daily GROUP BY event_type, day % 7
),
pieces AS (
  SELECT event_type,
         sum(CAST(floor((CAST(sw AS DOUBLE) * sw / nw) * 1000000 + 0.5) AS BIGINT)) AS ssb_q,
         count(*) AS k
  FROM grp GROUP BY event_type
),
tot AS (
  SELECT event_type, sum(c) AS t, count(*) AS n, sum(c * c) AS sq
  FROM daily GROUP BY event_type
)
SELECT {", ".join(_ANOVA_FINAL)}
FROM pieces JOIN tot USING (event_type)
WHERE {_ANOVA_SST} > {_ANOVA_SSB} AND n > k
""",
)
def q_anova_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of daily event volume across weekdays (per event
    type): F statistic + eta-squared — 'is there a real day-of-week
    seasonality' as a test, the inferential companion to q_autocorr's
    descriptive ACF and the decision input for q_forecast_eval's
    same-weekday baseline (a weak F means the seasonal-naive forecast
    is no better than a grand mean).  Weekdays are epoch-day % 7 (the
    integer rule both engines share).  Exactness: group sums/counts
    and Σc² are exact longs; the one order-sensitive reduction —
    Σ_w S_w²/n_w over the 7 groups — is micro-quantized per group and
    summed as longs; SSB/SST/F then come from one shared IEEE text.
    Shape: one combinable daily agg, two tiny rollups, a 5-row join."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp(F.date_trunc("DAY", F.col("ts"))) / 86400)
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=True)  # feeds grp + tot
    grp = daily.groupBy("event_type", (F.col("day") % 7).alias("wd")).agg(
        F.sum("c").alias("sw"), F.count(F.lit(1)).alias("nw")
    )
    pieces = grp.groupBy("event_type").agg(
        F.sum(
            F.expr(
                "CAST(floor((CAST(sw AS DOUBLE) * sw / nw) * 1000000 + 0.5) AS BIGINT)"
            )
        ).alias("ssb_q"),
        F.count(F.lit(1)).alias("k"),
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("c").alias("t"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("sq"),
    )
    return (
        pieces.join(tot, "event_type")
        .where(F.expr(f"{_ANOVA_SST} > {_ANOVA_SSB} AND n > k"))
        .selectExpr(*_ANOVA_FINAL)
    )


# ---------------------------------------------------------------- 2-D heatmap

_HM_VBUCKETS = 6  # value deciles would be 10; 6 keeps cells well-filled


@register(
    "q_heatmap_2d",
    oracle=f"""
WITH v AS (
  SELECT ts, CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v FROM events
),
b AS (
  SELECT {", ".join(f"quantile_cont(v, CAST({i} AS DOUBLE) / {_HM_VBUCKETS}) AS b{i}" for i in range(1, _HM_VBUCKETS))}
  FROM v
),
assigned AS (
  SELECT CAST(extract(hour FROM e.ts) AS BIGINT) AS hour_of_day,
         {" + ".join(f"CAST(e.v >= b.b{i} AS INT)" for i in range(1, _HM_VBUCKETS))} AS vbucket
  FROM v e CROSS JOIN b
)
SELECT hour_of_day, CAST(vbucket AS BIGINT) AS vbucket,
       CAST(count(*) AS BIGINT) AS n
FROM assigned GROUP BY hour_of_day, vbucket
""",
)
def q_heatmap_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D density heatmap: hour-of-day x value-band counts — the
    bivariate profile a dashboard renders and a CBO reads for
    correlated-column selectivity (independence between time and value
    would make every row of the heatmap proportional; q_chi2's visual
    twin).  The value axis uses equi-depth cuts (exact interpolated
    {b}-quantiles broadcast back, sum-of-compares band id — the
    q_equidepth_hist route), the hour axis is the calendar hour both
    engines extract identically from the us-precision timestamp.
    Boundary exactness: the quantile interpolates over exact uunit
    LONGS at an explicitly DOUBLE-cast fraction (Spark parses the
    literal i.0/6 as DECIMAL division — the recorded PSI lesson; the
    q_equidepth_hist form only dodges it because 1/8 is binary-exact)
    and the raw interpolated double is compared directly, no round().
    Shape: one percentile agg, one broadcast, one combinable 24x{b}
    closing agg.""".replace("{b}", str(_HM_VBUCKETS))
    e = load(spark, sf_dir, "events")
    v = e.select("ts", F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long").alias("v"))
    b = v.agg(
        *[
            F.expr(f"percentile(v, CAST({i} AS DOUBLE) / {_HM_VBUCKETS})").alias(f"b{i}")
            for i in range(1, _HM_VBUCKETS)
        ]
    )
    band = " + ".join(f"CAST(v >= b{i} AS INT)" for i in range(1, _HM_VBUCKETS))
    assigned = v.crossJoin(F.broadcast(b)).selectExpr(
        "CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day", f"{band} AS vbucket"
    )
    return assigned.groupBy("hour_of_day", "vbucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).select("hour_of_day", F.col("vbucket").cast("long").alias("vbucket"), "n")
