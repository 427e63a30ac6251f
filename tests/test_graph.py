"""PageRank over the relationally-derived trade graph."""

from pyspark.sql import functions as F

from matrix_multiplication_bigdata_ind_assignments_spark.operators import graph as G


def test_pagerank_mass_and_structure(spark, sf_dir):
    out = G.q_pagerank(spark, sf_dir)
    rows = out.collect()
    total = sum(r["rank"] for r in rows)
    # undirected graph → no dangling mass: Σrank = 1 up to per-iteration
    # 12-dp rounding drift over 10 rounds
    assert abs(total - 1.0) < 1e-6
    # PageRank on an undirected graph is asymptotically degree-
    # proportional: the 100-ish suppliers carry far higher degree than
    # the 1500 customers, so their mean rank must dominate
    sup = [r["rank"] for r in rows if r["kind"] == "supplier"]
    cus = [r["rank"] for r in rows if r["kind"] == "customer"]
    assert sup and cus
    assert (sum(sup) / len(sup)) > 5 * (sum(cus) / len(cus))


def test_pagerank_deterministic_repeat(spark, sf_dir):
    a = sorted(tuple(r) for r in G.q_pagerank(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in G.q_pagerank(spark, sf_dir).collect())
    assert a == b
