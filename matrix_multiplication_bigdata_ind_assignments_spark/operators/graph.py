"""Graph operators over relationally-derived graphs (SURVEY.md §2.3
'iterative algorithms' class; connected components live in dedup.py).

PageRank here is ORACLE-CHECKED — unusual for an iterative operator:
the fixed-iteration power method unrolls into chained SQL CTEs, and
per-iteration 12-dp rounding in BOTH engines pins the floating point so
different summation orders cannot drift across 10 iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load

_PR_DAMPING = 0.85
_PR_ITERS = 10


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    damping: float = _PR_DAMPING,
    iters: int = _PR_ITERS,
) -> DataFrame:
    """Power-method PageRank over an UNDIRECTED edge list ``(src, dst)``
    (each edge walks both ways — random-walk-on-a-graph semantics, which
    also sidesteps dangling-mass bookkeeping: every node with an edge
    has out-degree ≥ 1).

    Scale shape (the Pregel pattern in DataFrames): each iteration is
    one join of the edge list with the current rank vector keyed on src
    + one hash agg keyed on dst — both shuffles on node ids, map-side
    combinable; the rank vector is |V| rows, orders of magnitude smaller
    than the edges.  Lineage is truncated per round (localCheckpoint),
    otherwise iteration k re-plans all k-1 predecessors.  Ranks are
    rounded to 12 dp EACH iteration — the determinism contract that
    makes the unrolled-CTE oracle bit-comparable (summation order
    differs between engines; rounding every round stops drift from
    compounding).  Returns (node, rank) with Σrank ≤ 1 (no dangling
    nodes by construction)."""
    import os

    und = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = und.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)
    n_nodes = nodes.count()  # one O(|V|) stat job; the teleport term needs the scalar

    n_part = os.environ.get("MMBD_CC_SHUFFLE_PARTITIONS", "8")
    old_part = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n_part)
    try:
        ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
        for _ in range(iters):
            contribs = (
                und.join(ranks, und.src == ranks.node)
                .join(deg, "src")
                .groupBy("dst")
                .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("m"))
            )
            ranks = (
                nodes.join(contribs, nodes.node == contribs.dst, "left")
                .select(
                    "node",
                    F.round(
                        F.lit((1.0 - damping) / n_nodes)
                        + damping * F.coalesce(F.col("m"), F.lit(0.0)),
                        12,
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_part)
    return ranks


def _sql_pagerank(damping: float = _PR_DAMPING, iters: int = _PR_ITERS) -> str:
    """The identical power method as unrolled DuckDB CTEs (r0 … r{iters}),
    over the supplier↔customer trade graph."""
    d = damping
    ctes = [
        """e AS (
  SELECT DISTINCT l.l_suppkey * 2 AS src, o.o_custkey * 2 + 1 AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
ed AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM ed GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM ed),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT nodes.node,
         round({1.0 - d} / (SELECT n FROM nn) + {d} * coalesce(s.m, 0.0), 12) AS rank
  FROM nodes LEFT JOIN (
    SELECT ed.dst AS node, sum(r{i - 1}.rank / deg.outdeg) AS m
    FROM ed JOIN r{i - 1} ON ed.src = r{i - 1}.node JOIN deg ON deg.src = ed.src
    GROUP BY ed.dst
  ) s ON nodes.node = s.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'customer' END AS kind,
       CAST(node // 2 AS BIGINT) AS key,
       round(rank, 6) AS rank
FROM r{iters}
"""
    )


@register("q_pagerank", oracle=_sql_pagerank())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier↔customer trade graph (an edge per
    distinct (suppkey, custkey) pair appearing on the same order),
    damping 0.85, 10 power iterations — the canonical Pregel-style
    iterative workload, expressed as per-round join+agg over DataFrames
    and ORACLE-CHECKED against the same method unrolled into chained
    DuckDB CTEs (12-dp per-iteration rounding pins fp in both engines).
    Node ids are disambiguated arithmetically (supplier 2k, customer
    2k+1) and decoded to (kind, key) in the result."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("o_custkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(spark, edges)
    return ranks.select(
        F.when(F.col("node") % 2 == 0, F.lit("supplier")).otherwise(F.lit("customer")).alias("kind"),
        (F.col("node") / 2).cast("long").alias("key"),
        F.round("rank", 6).alias("rank"),
    )
