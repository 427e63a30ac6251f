"""Set operations, filters, distinct, column resolution
(SURVEY.md §2.2 q_algo_filter/q_distinct_sorted/q_mem_column_resolve,
§2.3 "Set ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load


@register(
    "q_set_ops",
    oracle="""
WITH building AS (SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     automobile AS (SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
SELECT 'both' AS tag, c_nationkey FROM (SELECT * FROM building INTERSECT SELECT * FROM automobile)
UNION ALL
SELECT 'building_only' AS tag, c_nationkey FROM (SELECT * FROM building EXCEPT SELECT * FROM automobile)
UNION ALL
SELECT 'automobile_only' AS tag, c_nationkey FROM (SELECT * FROM automobile EXCEPT SELECT * FROM building)
""",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect / except / union over customer-segment nation sets."""
    c = load(spark, sf_dir, "customer")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_nationkey").distinct()
    automobile = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey").distinct()
    both = building.intersect(automobile).select(F.lit("both").alias("tag"), "c_nationkey")
    b_only = building.exceptAll(automobile).distinct().select(
        F.lit("building_only").alias("tag"), "c_nationkey"
    )
    a_only = automobile.exceptAll(building).distinct().select(
        F.lit("automobile_only").alias("tag"), "c_nationkey"
    )
    return both.unionByName(b_only).unionByName(a_only)


@register(
    "q_distinct_sorted",
    oracle="SELECT DISTINCT p_size FROM part ORDER BY p_size",
)
def q_distinct_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct sorted key list (ref `Stage 3/Visualization/mm_perf_parallel_visualizer.py:73`)."""
    return load(spark, sf_dir, "part").select("p_size").distinct().orderBy("p_size")


@register(
    "q_algo_filter",
    oracle="""
SELECT event_id, event_type, round(value, 6) AS value
FROM events WHERE event_type IN ('purchase', 'view')
""",
)
def q_algo_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset filter by category (ref algo-subset split
    `Stage 2/Visualization/mm_perf_visualizer.py:57-60`); the IN predicate
    is pushed to the parquet scan."""
    e = load(spark, sf_dir, "events")
    return e.where(F.col("event_type").isin("purchase", "view")).select(
        "event_id", "event_type", F.round("value", 6).alias("value")
    )


@register(
    "q_mem_column_resolve",
    oracle="""
SELECT doc_id,
       coalesce(CASE WHEN lang = 'en' THEN n_chars END,
                CASE WHEN lang = 'es' THEN n_chars * 2 END,
                CAST(-1 AS BIGINT)) AS resolved_metric
FROM documents
""",
)
def q_mem_column_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category column resolution via coalesce/CASE (ref per-lang memory
    column map `Stage 1/Visualization/mm_perf_visualizer.py:72-102`)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.coalesce(
            F.when(F.col("lang") == "en", F.col("n_chars")),
            F.when(F.col("lang") == "es", F.col("n_chars") * 2),
            F.lit(-1).cast("long"),
        ).alias("resolved_metric"),
    )
