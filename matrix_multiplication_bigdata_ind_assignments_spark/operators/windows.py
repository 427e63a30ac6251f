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
