"""Window functions & sorts (SURVEY.md §2.3 "Window functions", "Sorts").

Every ordering carries an explicit unique tiebreaker (event_id / partkey /
orderkey) so top-k and frame results are total-order deterministic in both
engines (SURVEY.md §7 risk register).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import fx_sum_window, sql_fx_sum_over
from ..registry import register
from ..sources import load


@register(
    "q_topk_per_group",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice, rk FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         CAST(row_number() OVER (PARTITION BY p_brand
              ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rk
  FROM part
) WHERE rk <= 3
""",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand by retail price (row_number window)."""
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


@register(
    "q_rank_dense_rank",
    oracle="""
SELECT o_orderpriority, o_orderkey,
       CAST(rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk,
       CAST(dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_orderstatus) AS BIGINT) AS drnk
FROM orders
""",
)
def q_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + dense_rank in one projection."""
    o = load(spark, sf_dir, "orders")
    w1 = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    w2 = Window.partitionBy("o_orderpriority").orderBy("o_orderstatus")
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.rank().over(w1).cast("long").alias("rnk"),
        F.dense_rank().over(w2).cast("long").alias("drnk"),
    )


@register(
    "q_moving_avg",
    oracle=f"""
SELECT event_id, user_id,
       round({sql_fx_sum_over("value", "frame3")}
             / count(*) OVER frame3, 6) AS mavg,
       round(lag(value) OVER ordered, 6) AS prev_value,
       round(lead(value) OVER ordered, 6) AS next_value
FROM events
WINDOW ordered AS (PARTITION BY user_id ORDER BY ts, event_id),
       frame3 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average + lag/lead per user over event time."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame3 = w.rowsBetween(-2, 0)
    return e.select(
        "event_id",
        "user_id",
        F.round(
            fx_sum_window("value", frame3) / F.count(F.lit(1)).over(frame3), 6
        ).alias("mavg"),
        F.round(F.lag("value").over(w), 6).alias("prev_value"),
        F.round(F.lead("value").over(w), 6).alias("next_value"),
    )


@register(
    "q_running_total",
    oracle=f"""
SELECT event_id, user_id,
       {sql_fx_sum_over("value", '''(PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')} AS running_total
FROM events
""",
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals per user (prefix-sum window)."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", fx_sum_window("value", w).alias("running_total")
    )


@register(
    "q_top_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
)
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — Spark plans TakeOrderedAndProject (per-partition
    top-k + tiny driver merge), no global sort even at 100 TB."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q_sessionize_batch",
    oracle="""
SELECT user_id, session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(sec) AS session_start, max(sec) AS session_end
FROM (
  SELECT user_id, sec,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM (
    SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
           CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                     - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                THEN 1 ELSE 0 END AS new_sess
    FROM events WHERE user_id IS NOT NULL
  )
)
GROUP BY user_id, session_id
""",
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts after
    a >30-minute silence; session id is the running count of session
    starts.  The batch twin of q_stream_session — same 30-minute gap rule,
    computed with two stacked windows instead of streaming state.  One
    shuffle on user_id serves both windows and the final rollup (Spark
    reuses the partitioning), so the shape scales as a single pass."""
    e = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    sec = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "event_id",
        sec.alias("sec"),
        F.when(sec - F.lag(sec).over(w) > 1800, 1).otherwise(0).alias("new_sess"),
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn("session_id", F.sum("new_sess").over(run))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("sec").alias("session_start"),
        F.max("sec").alias("session_end"),
    )


@register(
    "q_window_range_frame",
    oracle=f"""
SELECT event_id, user_id,
       CAST(count(*) OVER hour_back AS BIGINT) AS n_last_hour,
       {sql_fx_sum_over("value", "hour_back")} AS sum_last_hour
FROM events WHERE user_id IS NOT NULL
WINDOW hour_back AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
""",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): per user, events
    and value-sum in the trailing hour.  Unlike ROWS frames, RANGE includes
    ordering peers, so no tiebreaker is needed for determinism — both
    engines see the same floored-epoch ordering key and the same peer
    sets."""
    e = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    sec = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id").orderBy(sec).rangeBetween(-3600, 0)
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_last_hour"),
        fx_sum_window("value", w).alias("sum_last_hour"),
    )


@register(
    "q_nth_value",
    oracle="""
SELECT event_id, user_id,
       round(first_value(value) OVER full_part, 6) AS first_v,
       round(last_value(value) OVER full_part, 6) AS last_v,
       round(nth_value(value, 2) OVER full_part, 6) AS second_v
FROM events WHERE user_id IS NOT NULL
WINDOW full_part AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def q_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over the full partition frame
    (the frame must be explicit: the default frame stops at CURRENT ROW,
    which silently turns last_value into 'current value')."""
    e = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.first("value").over(w), 6).alias("first_v"),
        F.round(F.last("value").over(w), 6).alias("last_v"),
        F.round(F.nth_value("value", 2).over(w), 6).alias("second_v"),
    )


#: shared by q_skyline_2d and its distributed-scan twin
_SKYLINE_ORACLE = """
WITH r AS (
  SELECT p_partkey, p_brand, p_retailprice, p_size,
         max(p_size) OVER (
           ORDER BY p_retailprice ASC, p_size DESC, p_partkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS best_size_cheaper
  FROM part
)
SELECT p_partkey, p_brand, round(p_retailprice, 6) AS p_retailprice,
       CAST(p_size AS BIGINT) AS p_size
FROM r
WHERE best_size_cheaper IS NULL OR p_size > best_size_cheaper
"""


def _skyline_close(r: DataFrame) -> DataFrame:
    """Frontier filter + projection shared by both skyline forms."""
    return r.where(
        F.col("best_size_cheaper").isNull() | (F.col("p_size") > F.col("best_size_cheaper"))
    ).select(
        "p_partkey",
        "p_brand",
        F.round("p_retailprice", 6).alias("p_retailprice"),
        F.col("p_size").cast("long").alias("p_size"),
    )


@register("q_skyline_2d", oracle=_SKYLINE_ORACLE)
def q_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) over part: the parts no other part
    dominates on (cheaper price, bigger size) — the multi-criteria
    shortlist query (BNL skylines are the textbook O(n²) trap).  The
    2-D case collapses to ONE ordered window pass: sort by (price ASC,
    size DESC), keep rows whose size beats the running max of
    everything cheaper — O(n log n), no self-join, no nested loop.
    Tie semantics: equal-price rows never dominate each other (the
    1-PRECEDING frame with size DESC ordering means an equal-price
    larger row DOES shadow smaller ones — strict dominance on price is
    relaxed to ≤ within a price tie only for the frame's max, matching
    the oracle text exactly).  A skyline is a global property; at scale
    q_skyline_2d_scalable runs the SAME pass as a distributed prefix-max
    scan (and the classic refinement — local per-partition skylines
    first, which prune nothing wrongly — composes in front of either
    form)."""
    p = load(spark, sf_dir, "part")
    w = (
        Window.orderBy(
            F.col("p_retailprice").asc(), F.col("p_size").desc(), F.col("p_partkey").asc()
        ).rowsBetween(Window.unboundedPreceding, -1)
    )
    r = p.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        "p_size",
        F.max("p_size").over(w).alias("best_size_cheaper"),
    )
    return _skyline_close(r)


@register("q_skyline_2d_scalable", oracle=_SKYLINE_ORACLE)
def q_skyline_2d_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_skyline_2d with the global exclusive running max replaced by
    the distributed two-pass scan's prefix-MAX arm (functions/scan.py
    extra_maxes — the r12 scale-safe-twin family): range-partition on
    the same (price ASC, size DESC, partkey ASC) total order, local
    exclusive running max per partition, per-partition maxes → driver →
    prefix-max base offsets broadcast back (greatest() skips NULLs, so
    the first partition degrades exactly like the window's leading
    NULL).  Identical output for any range-boundary placement; SAME
    oracle; no stage sorts more than |parts| / n_partitions rows."""
    from ..functions.scan import two_pass_scan

    p = load(spark, sf_dir, "part")
    r, _, _ = two_pass_scan(
        p.select("p_partkey", "p_brand", "p_retailprice", "p_size"),
        [F.asc("p_retailprice"), F.desc("p_size"), F.asc("p_partkey")],
        inclusive=False,
        extra_maxes=[("p_size", "best_size_cheaper")],
    )
    return _skyline_close(r)


@register(
    "q_time_weighted_avg",
    oracle="""
WITH seg AS (
  SELECT user_id, value,
         epoch_us(ts) AS us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
w AS (
  SELECT user_id,
         sum(CAST(CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS DECIMAL(38,0))
             * (nxt - us)) AS wsum,
         sum(nxt - us) AS span
  FROM seg WHERE nxt IS NOT NULL GROUP BY user_id
)
SELECT user_id,
       CAST(span AS BIGINT) AS span_us,
       floor(CAST(wsum AS DOUBLE) / span / 1000000 * 1000000 + 0.5) / 1000000 AS twap
FROM w
""",
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP — the telemetry /
    finance standard where a value HOLDS until the next observation,
    so a reading that stood for an hour must outweigh one that stood
    for a second): each event's value is weighted by its holding
    interval (lead(ts) − ts), last observation carries no weight (no
    successor to bound it).  One window pass for the intervals (the
    q_scd2_intervals shape) + one combinable agg; the weighted sum is
    EXACT integer arithmetic through DECIMAL(38,0) (µunit value × µs
    interval overflows int64 for multi-day gaps — the regression-family
    _SUMS route) and the closing division is one shared floor-text."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("us"),
        F.lead(F.unix_micros("ts")).over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    g = seg.groupBy("user_id").agg(
        F.sum(
            F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long").cast("decimal(38,0)")
            * (F.col("nxt") - F.col("us"))
        ).alias("wsum"),
        F.sum(F.col("nxt") - F.col("us")).alias("span"),
    )
    return g.select(
        "user_id",
        F.col("span").cast("long").alias("span_us"),
        F.expr(
            "floor(CAST(wsum AS DOUBLE) / span / 1000000 * 1000000 + 0.5) / 1000000"
        ).alias("twap"),
    )


#: shared by q_peak_concurrency and its distributed-scan twin
_PEAK_ORACLE = """
WITH sess AS (
  SELECT user_id, epoch_us(ts) AS s_us, epoch_us(ts) + 1800000000 AS e_us
  FROM events
),
pts AS (
  SELECT s_us AS us, 1 AS delta FROM sess
  UNION ALL
  SELECT e_us AS us, -1 AS delta FROM sess
),
agg AS (SELECT us, sum(delta) AS d FROM pts GROUP BY us),
run AS (
  SELECT us, sum(d) OVER (ORDER BY us
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
  FROM agg
)
SELECT CAST(max(live) AS BIGINT) AS peak_concurrent,
       CAST(max_by(us, live * 10000000000000000 - us) AS BIGINT) AS peak_at_us
FROM run
"""


def _peak_boundary_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct boundary points with merged +1/−1 deltas (the combinable
    first pass both peak-concurrency forms share)."""
    e = load(spark, sf_dir, "events")
    sess = e.select(
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + 1_800_000_000).alias("e_us"),
    )
    pts = sess.select(F.col("s_us").alias("us"), F.lit(1).alias("delta")).unionAll(
        sess.select(F.col("e_us").alias("us"), F.lit(-1).alias("delta"))
    )
    return pts.groupBy("us").agg(F.sum("delta").alias("d"))


def _peak_close(run: DataFrame) -> DataFrame:
    """Closing high-water-mark agg shared by both forms."""
    return run.agg(
        F.max("live").cast("long").alias("peak_concurrent"),
        F.expr("max_by(us, live * 10000000000000000 - us)")
        .cast("long")
        .alias("peak_at_us"),
    )


@register("q_peak_concurrency", oracle=_PEAK_ORACLE)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency via the +1/−1 sweep: every event opens a
    30-minute activity interval; the answer is the maximum number of
    simultaneously-open intervals and the earliest µs at which it is
    reached — the capacity-planning primitive (peak sessions, max
    connections, license high-water mark).  The sweep is exact
    integers end-to-end: boundary deltas collapse in one combinable
    agg (ties merge BEFORE the scan, so open-at-same-µs-as-close is
    handled consistently in both engines), the running sum is one
    ordered window over DISTINCT boundary points (not events), and
    the argmax packs (live DESC, us ASC) into one long.  The global
    window is the honest cost of a global high-water mark at fixture
    scale; q_peak_concurrency_scalable runs the SAME sweep through the
    distributed two-pass scan, and per-key (e.g. per-tenant) peaks
    would partition it."""
    agg = _peak_boundary_deltas(spark, sf_dir)
    w = Window.orderBy("us").rowsBetween(Window.unboundedPreceding, 0)
    run = agg.select("us", F.sum("d").over(w).alias("live"))
    return _peak_close(run)


@register("q_peak_concurrency_scalable", oracle=_PEAK_ORACLE)
def q_peak_concurrency_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_peak_concurrency with the global running sum replaced by the
    distributed two-pass prefix scan (functions/scan.py — the r12
    scale-safe-twin family): the +1/−1 sweep's cumulative 'live' count
    is an inclusive cumsum over the distinct boundary points, so no
    stage sorts more than |boundaries| / n_partitions rows (boundaries
    ~ 2·|events| distinct µs at worst — exactly the input a
    single-partition window would choke on at 100×).  Identical output
    for any range-boundary placement; registers the SAME oracle."""
    from ..functions.scan import two_pass_scan

    agg = _peak_boundary_deltas(spark, sf_dir)
    run, _, _ = two_pass_scan(
        agg, [F.asc("us")], sum_col="d", cum_col="live", inclusive=True
    )
    return _peak_close(run.select("us", "live"))


# burst threshold: an hour is bursty when its count beats 1.25x the
# type's mean hourly volume — all-integer compare (4*c*H > 5*T)
_BURST_NUM, _BURST_DEN = 5, 4


@register(
    "q_burst_intervals",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, count(*) AS c
  FROM events GROUP BY event_type, h
),
tot AS (
  SELECT event_type, sum(c) AS t, count(*) AS hh FROM hourly GROUP BY event_type
),
bursty AS (
  SELECT hourly.event_type, hourly.h
  FROM hourly JOIN tot ON hourly.event_type = tot.event_type
  WHERE {_BURST_DEN} * hourly.c * tot.hh > {_BURST_NUM} * tot.t
),
isl AS (
  SELECT event_type, h,
         h - row_number() OVER (PARTITION BY event_type ORDER BY h) AS grp
  FROM bursty
),
intervals AS (
  SELECT event_type, min(h) AS start_h, max(h) + 1 AS end_h,
         count(*) AS n_hours
  FROM isl GROUP BY event_type, grp
)
SELECT i.event_type, CAST(i.start_h AS BIGINT) AS start_h,
       CAST(i.end_h AS BIGINT) AS end_h, CAST(i.n_hours AS BIGINT) AS n_hours,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM intervals i
JOIN events e ON e.event_type = i.event_type
             AND floor(epoch(e.ts) / 3600) >= i.start_h
             AND floor(epoch(e.ts) / 3600) <  i.end_h
GROUP BY i.event_type, i.start_h, i.end_h, i.n_hours
""",
)
def q_burst_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst-interval construction + point-in-interval join back: per
    event type, hours beating 1.25x the mean hourly volume are
    coalesced into maximal intervals (gaps-and-islands over the HOURLY
    rollup, never the event stream), then every event is matched to
    its containing burst interval and each interval reports its event
    and distinct-user mass — the incident-window / hot-period analysis
    an ops pipeline runs over ingest telemetry.  This is the
    dim-broadcast RANGE JOIN shape that survives 100 TB: the interval
    side is tiny by construction (islands of an hourly rollup), so the
    fact side never shuffles for the match (broadcast + two compares),
    and the closing agg is combinable (distinct users being the one
    two-phase piece).  All-integer: the burst cut is the cross-
    multiplied compare {d}*c*H > {n}*T (no rational mean), hours are
    epoch-floored longs."""
    e = load(spark, sf_dir, "events")
    hour = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    hourly = e.groupBy("event_type", hour.alias("h")).agg(F.count(F.lit(1)).alias("c"))
    tot = hourly.groupBy("event_type").agg(
        F.sum("c").alias("t"), F.count(F.lit(1)).alias("hh")
    )
    bursty = (
        hourly.join(F.broadcast(tot), "event_type")
        .where(_BURST_DEN * F.col("c") * F.col("hh") > _BURST_NUM * F.col("t"))
        .select("event_type", "h")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    isl = bursty.select("event_type", "h", (F.col("h") - F.row_number().over(w)).alias("grp"))
    intervals = isl.groupBy("event_type", "grp").agg(
        F.min("h").alias("start_h"),
        (F.max("h") + 1).alias("end_h"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    iv = intervals.select(
        F.col("event_type").alias("bt"), "start_h", "end_h", "n_hours"
    ).localCheckpoint(eager=True)  # tiny island table; breaks self-join lineage
    probe = e.select("event_type", "user_id", hour.alias("eh"))
    return (
        probe.join(
            F.broadcast(iv),
            on=[
                F.col("event_type") == F.col("bt"),
                F.col("eh") >= F.col("start_h"),
                F.col("eh") < F.col("end_h"),
            ],
        )
        .groupBy("bt", "start_h", "end_h", "n_hours")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .select(
            F.col("bt").alias("event_type"),
            F.col("start_h").cast("long").alias("start_h"),
            F.col("end_h").cast("long").alias("end_h"),
            F.col("n_hours").cast("long").alias("n_hours"),
            "n_events",
            "n_users",
        )
    )


#: EWMA(alpha=1/2) over the last 8 events, as exact integer weights
#: 64,32,...,2,1,1 (the tail weight absorbs the remainder so a full
#: window's weights sum to 128); partial windows renormalize by the
#: weights actually present — all-integer, so both engines agree bit-for-bit
_EWMA_W = (64, 32, 16, 8, 4, 2, 1, 1)


def _ewma_terms(col: str = "v") -> tuple[str, str]:
    """(numerator, denominator) SQL text over lag columns l0..l7."""
    num = " + ".join(f"coalesce({w} * l{j}, 0)" for j, w in enumerate(_EWMA_W))
    den = " + ".join(
        f"CASE WHEN l{j} IS NOT NULL THEN {w} ELSE 0 END" for j, w in enumerate(_EWMA_W)
    )
    return f"({num})", f"({den})"


@register(
    "q_ewma",
    oracle=f"""
WITH v AS (
  SELECT user_id, event_id, ts,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
  FROM events
),
lagged AS (
  SELECT user_id, event_id, ts,
         {", ".join(f"lag(v, {j}) OVER w AS l{j}" for j in range(len(_EWMA_W)))},
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rd,
         count(*) OVER (PARTITION BY user_id) AS n_events
  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       (CAST(floor((CAST({_ewma_terms()[0]} AS DOUBLE) / {_ewma_terms()[1]} / 1000000)
        * 1000000 + 0.5) AS DOUBLE) / 1000000) AS ewma
FROM lagged WHERE rd = 1
""",
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of the event
    value (alpha=1/2 over the trailing 8 events) — the telemetry
    smoothing primitive under rate limiting and anomaly baselines.
    The recursion is unrolled into EXACT integer weights (64,32,...,1
    with the tail absorbing the remainder; partial windows renormalize
    by the weights present), values ride 6-dp fixed point, so the
    weighted sum is an exact long and both engines agree bit-for-bit —
    the standard recursive double EWMA would drift per partitioning.
    Shape: ONE user_id shuffle serves the lag chain, the
    recency ranking, and the per-user count (same window partition);
    output is one row per user (the current smoothed level)."""
    e = load(spark, sf_dir, "events")
    v = e.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long").alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    lagged = v.select(
        "user_id",
        *[F.lag("v", j).over(w).alias(f"l{j}") for j in range(len(_EWMA_W))],
        F.row_number().over(wd).alias("rd"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_events"),
    )
    num, den = _ewma_terms()
    return lagged.where(F.col("rd") == 1).selectExpr(
        "user_id",
        "CAST(n_events AS BIGINT) AS n_events",
        f"(CAST(floor((CAST({num} AS DOUBLE) / {den} / 1000000) * 1000000 + 0.5) AS DOUBLE)"
        " / 1000000) AS ewma",
    )


@register(
    "q_ohlc_bars",
    oracle="""
WITH ordered AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
         value, ts, event_id,
         row_number() OVER w AS ra,
         row_number() OVER (PARTITION BY event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT)
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM events
  WINDOW w AS (PARTITION BY event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT)
               ORDER BY ts, event_id)
)
SELECT event_type, hour,
       CAST(count(*) AS BIGINT) AS n,
       round(max(CASE WHEN ra = 1 THEN value END), 6) AS open,
       round(max(value), 6) AS high,
       round(min(value), 6) AS low,
       round(max(CASE WHEN rd = 1 THEN value END), 6) AS close
FROM ordered GROUP BY event_type, hour
""",
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candle bars per event type (open/high/low/close +
    volume) — the time-series downsampling shape every telemetry and
    finance store serves.  Open/close are first/last by the
    (ts, event_id) TOTAL order (row_number in both directions — no
    first_value frame ambiguity between engines); high/low are plain
    min/max (exact double passthrough, no sums, so no FP route
    needed).  Shape: ONE (type, hour) shuffle serves both ranking
    windows and the closing agg — the same single-pass discipline as
    q_sessionize_batch."""
    e = load(spark, sf_dir, "events")
    hour = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    wa = Window.partitionBy("event_type", "hour").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "hour").orderBy(F.desc("ts"), F.desc("event_id"))
    ordered = e.select(
        "event_type", hour.alias("hour"), "value", "ts", "event_id"
    ).select(
        "event_type",
        "hour",
        "value",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    return ordered.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.max(F.when(F.col("ra") == 1, F.col("value"))), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max(F.when(F.col("rd") == 1, F.col("value"))), 6).alias("close"),
    )


_RMED_K = 5  # trailing window width (current + 4 predecessors)


def _rmed_terms() -> tuple[str, str]:
    """(sorted-array, n-available) SQL text over lag columns l0..l4 —
    Spark and DuckDB share the name `array_sort`/`list_sort` split but
    the expression shape is identical."""
    arr = ", ".join(f"l{j}" for j in range(_RMED_K))
    return arr, " + ".join(f"CAST(l{j} IS NOT NULL AS INT)" for j in range(_RMED_K))


@register(
    "q_rolling_median",
    oracle=f"""
WITH v AS (
  SELECT user_id, event_id, ts,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
  FROM events
),
lagged AS (
  SELECT user_id, event_id,
         {", ".join(f"lag(v, {j}) OVER w AS l{j}" for j in range(_RMED_K))}
  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
srt AS (
  SELECT user_id, event_id,
         list_sort(list_filter([{_rmed_terms()[0]}], x -> x IS NOT NULL)) AS s,
         {_rmed_terms()[1]} AS n
  FROM lagged
)
SELECT user_id, event_id, CAST(n AS BIGINT) AS n_window,
       (CAST(CASE WHEN n % 2 = 1 THEN 2 * s[(n + 1) // 2]
                  ELSE s[n // 2] + s[n // 2 + 1] END AS DOUBLE) / 2 / 1000000)
       AS rolling_median
FROM srt
""",
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-{k} rolling median of the event value per user —
    the robust smoother (q_ewma's outlier-proof sibling; one spiked
    reading moves an EWMA but not a median).  No engine has a median
    window aggregate, so the window materializes the {k} lags and takes
    the middle of the sorted non-null array — O(k log k) per row with
    k fixed, which is how a rolling median should run at 100 TB (never
    a per-row re-sort of an unbounded frame).  Exact: values are
    6-dp fixed-point longs, the even-width midpoint is kept as the
    integer SUM of the two middles and divided once in shared IEEE
    text, so both engines emit identical doubles.  Shape: ONE user_id
    shuffle serves the lag chain; everything after is per-row array
    algebra.""".replace("{k}", str(_RMED_K))
    e = load(spark, sf_dir, "events")
    v = e.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long").alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = v.select(
        "user_id",
        "event_id",
        *[F.lag("v", j).over(w).alias(f"l{j}") for j in range(_RMED_K)],
    )
    arr, n = _rmed_terms()
    srt = lagged.selectExpr(
        "user_id",
        "event_id",
        f"array_sort(filter(array({arr}), x -> x IS NOT NULL)) AS s",
        f"{n} AS n",
    )
    return srt.selectExpr(
        "user_id",
        "event_id",
        "CAST(n AS BIGINT) AS n_window",
        "(CAST(CASE WHEN n % 2 = 1 THEN 2 * element_at(s, CAST((n + 1) DIV 2 AS INT))"
        " ELSE element_at(s, CAST(n DIV 2 AS INT)) + element_at(s, CAST(n DIV 2 + 1 AS INT))"
        " END AS DOUBLE) / 2 / 1000000) AS rolling_median",
    )
