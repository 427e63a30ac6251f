"""Landmark-based harmonic closeness centrality (SURVEY.md §2.3
'iterative algorithms' class): the Eppstein–Wang estimator (SODA'01,
"Fast approximation of centrality") — exact BFS distances from a
BOUNDED landmark sample, harmonically aggregated per node.  Completes
the centrality family next to the eigenvector kinds (q_pagerank /
q_trustrank / q_hits): closeness ranks nodes by graph DISTANCE, which
eigenvector scores cannot see (a node bridging two clusters is close to
everything yet feeds no flow cycle).

Harmonic form (Boldi–Vigna, "Axioms for centrality", 2014): H(v) =
Σ_{l ∈ L, d(v,l)>0} 1/d(v,l) — sums over the landmark sample only,
handles disconnected pairs natively (missing pair ⇒ contributes 0,
where classic closeness would need ∞).

Scale shape: the landmark set L is an arithmetic 10% supplier sample
(node % 20 == 0 — the q_trustrank seed rule, so both engines derive it
from the data), and the estimator's whole point is |L| stays BOUNDED as
the graph grows (Eppstein–Wang: O(log n / ε²) landmarks for ε-accurate
centrality).  The BFS is the bfs_hops delta/frontier loop with state
keyed on (node, landmark) pairs — per-round shuffle is
O(|frontier| · avg-degree), frontier/visited localCheckpoint per round,
empty-frontier early stop; the |V|·|L| distance table is the documented
memory envelope (swap the broadcast frontier joins for the shuffled
copartition form past broadcast size, the graph.pagerank switch).

Determinism/oracle contract: distances are all-integer monotone
relaxations with a fixed unroll (the bfs_hops recipe) so the
identically-unrolled DuckDB CTEs agree exactly; the single fp step (the
harmonic sum of ≤|L| reciprocals) is rounded 12 dp in-plan in both
engines.  The sweep's R+1-stability post_check re-runs the oracle with
one extra round — a fixture needing deeper search fails loudly instead
of hashing green wrong-together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .graph import _unroll_stability_check, trade_edges

_CL_ROUNDS = 6  # fixed unroll; the trade graph settles in <=3 (dense bipartite)
_CL_SEED_MOD = 20  # landmarks = trusted suppliers (node % 20 == 0), ~10% of suppliers


def landmark_distances(
    edges: DataFrame,
    rounds: int = _CL_ROUNDS,
    seed_mod: int = _CL_SEED_MOD,
    join_strategy: str = "broadcast",
) -> DataFrame:
    """(node, lm, dist): exact hop distance from every landmark to every
    node reachable within ``rounds``, via the multi-source delta/frontier
    BFS of graph.bfs_hops generalized to per-landmark state — the
    frontier carries (node, lm, dist) triples and first-reach per PAIR
    is minimal (unit weights), so relaxation is integer and monotone.

    ``join_strategy`` (the graph.pagerank switch, and NOT theoretical
    here: tools/centrality_growth_probe.py's disjoint-10x arm BLEW the
    broadcast build — the pair frontier peaks at |V|·|L| scale, far
    bigger than any single-vector frontier):

    - ``'broadcast'`` (default): the frontier side broadcasts — zero
      edge movement; right while the PAIR frontier fits an executor.
      (The settled-pair table is never broadcast in either arm — it is
      the largest frame; the first-reach anti-join always shuffles on
      the (node, lm) key.)
    - ``'copartition'``: the symmetric edge list is hash-clustered on
      src ONCE (persisted) and the loop pins shuffle partitions to its
      count, so each round's expansion exchanges ONLY the frontier side
      (EnsureRequirements reuses the edges' clustering), and the
      first-reach anti-join shuffles pair-state — per-round cost
      O(|frontier| + touched edges), never a driver-memory broadcast.
      The probe's growth arms run this arm; results are bit-identical
      (integer monotone relaxation is join-order-invariant; asserted in
      tests/test_closeness.py)."""
    if join_strategy not in ("broadcast", "copartition"):
        raise ValueError(f"unknown join_strategy {join_strategy!r}")
    import os

    bc = F.broadcast if join_strategy == "broadcast" else (lambda df: df)
    n_part = int(os.environ.get("MMBD_CC_SHUFFLE_PARTITIONS", "8"))
    spark = edges.sparkSession
    ck = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
    sym = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if join_strategy == "copartition":
        sym = sym.repartition(n_part, "src").persist()
        sym.count()  # materialize the one-time clustering
    else:
        sym = ck(sym)
    dist = ck(
        sym.select("src")
        .where(F.col("src") % seed_mod == 0)
        .distinct()
        .select(
            F.col("src").alias("node"),
            F.col("src").alias("lm"),
            F.lit(0).cast("long").alias("dist"),
        )
    )
    frontier = dist
    old_part = spark.conf.get("spark.sql.shuffle.partitions")
    if join_strategy == "copartition":
        spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    try:
        for r in range(rounds):
            reached = (
                sym.join(bc(frontier.withColumnRenamed("node", "src")), "src")
                .select(F.col("dst").alias("node"), "lm", (F.col("dist") + 1).alias("dist"))
                .groupBy("node", "lm")
                .agg(F.min("dist").alias("dist"))
            )
            # the settled-pair table is the LARGEST frame (peaks at
            # |V|·|L|): the first-reach anti-join is never broadcast in
            # either arm — it shuffles on the (node, lm) key
            new = ck(reached.join(dist, ["node", "lm"], "left_anti"))
            if r < rounds - 2 and new.isEmpty():
                break  # pair-frontier fixpoint: remaining rounds relax nothing
            dist = ck(dist.unionAll(new))
            frontier = new
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_part)
        if join_strategy == "copartition":
            sym.unpersist()
    return dist


def _sql_closeness(rounds: int = _CL_ROUNDS) -> str:
    """The identical per-landmark BFS + harmonic sum as unrolled DuckDB
    CTEs (state keyed on (node, lm) pairs; min-over-union relaxation)."""
    ctes = [
        f"""e AS MATERIALIZED (
  SELECT DISTINCT l.l_suppkey * 2 AS src, o.o_custkey * 2 + 1 AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
ed AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
d0 AS (
  SELECT src AS node, src AS lm, 0 AS dist
  FROM (SELECT DISTINCT src FROM ed WHERE src % {_CL_SEED_MOD} = 0)
)"""
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
  SELECT node, lm, min(dist) AS dist FROM (
    SELECT node, lm, dist FROM d{i - 1}
    UNION ALL
    SELECT ed.dst AS node, d.lm, d.dist + 1 AS dist
    FROM ed JOIN d{i - 1} d ON ed.src = d.node
  ) GROUP BY node, lm
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
nodes AS (SELECT DISTINCT src AS node FROM ed),
h AS (
  SELECT node, round(sum(1.0 / dist), 12) AS h
  FROM d{rounds} WHERE dist > 0 GROUP BY node
)
SELECT CASE WHEN nodes.node % 2 = 0 THEN 'supplier' ELSE 'customer' END AS kind,
       CAST(nodes.node // 2 AS BIGINT) AS key,
       round(coalesce(h.h, 0.0), 6) AS harmonic
FROM nodes LEFT JOIN h ON nodes.node = h.node
"""
    )


@register(
    "q_closeness_landmarks",
    oracle=_sql_closeness(),
    post_check=_unroll_stability_check(_sql_closeness, _CL_ROUNDS, "_CL_ROUNDS"),
)
def q_closeness_landmarks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic closeness centrality over the supplier↔customer trade
    graph from the 10% landmark supplier sample: per-(node, landmark)
    BFS distances (delta/frontier loop, 6-round fixed unroll) →
    H(v) = round(Σ 1/d(v,l), 12) — the distance-based centrality beside
    the eigenvector family, oracle-checked via identically-unrolled
    CTEs with an R+1-stability certificate in the sweep."""
    edges = trade_edges(spark, sf_dir)
    dists = landmark_distances(edges)
    # the universe is EVERY graph node, not just reached ones — a node no
    # landmark reaches must still emit harmonic 0.0 (matching the oracle)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    h = (
        dists.where(F.col("dist") > 0)
        .groupBy("node")
        .agg(F.round(F.sum(F.lit(1.0) / F.col("dist")), 12).alias("h"))
    )
    return (
        nodes.join(F.broadcast(h), "node", "left")
        .select(
            F.when(F.col("node") % 2 == 0, F.lit("supplier"))
            .otherwise(F.lit("customer"))
            .alias("kind"),
            (F.col("node") / 2).cast("long").alias("key"),
            F.round(F.coalesce(F.col("h"), F.lit(0.0)), 6).alias("harmonic"),
        )
    )
