"""k-core + label-propagation EDGE-GROWTH probe: the last two graph
operators without a SCALING.md byte-growth row (PageRank and triangles
have theirs).  Blows the co-supply graph up ~10x the same two ways as
tri_growth_probe.py and records, for the full fixed-round loops:

- ``disjoint``: 10 node-shifted copies — |V| and |E| grow 10x with
  per-component structure unchanged; both loops' shuffle bytes should
  track ~10x (the per-round work is degree aggs + label joins over the
  live vertex/edge sets).
- ``rotated``: 10 edge-rotated copies over the SAME node set —
  densification: |V| fixed, |E| ~10x, degrees rise.  k-core peeling
  should REMOVE less (denser graph → bigger core → fewer live-set
  shrink rounds); label-prop vote volume tracks |E| per round.

Usage: python tools/graph_growth_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from matrix_multiplication_bigdata_ind_assignments_spark.functions.metrics import (
        settled_snapshot,
        shuffle_delta,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.operators import graph as G
    from matrix_multiplication_bigdata_ind_assignments_spark.session import get_spark

    spark = get_spark(
        "graph-growth-probe",
        cpus="32",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "40000",
            "spark.ui.retainedJobs": "40000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = G.cosupply_edges(spark, sf_dir).localCheckpoint(eager=True)
    off = base.agg(F.greatest(F.max("u"), F.max("v"))).first()[0] + 1

    def disjoint(k: int):
        return (
            spark.range(k)
            .crossJoin(base)
            .select(
                (F.col("u") + F.col("id") * off).alias("u"),
                (F.col("v") + F.col("id") * off).alias("v"),
            )
        )

    def rotated(k: int):
        step = max(1, off // (k + 1))
        shifted = (
            spark.range(k)
            .crossJoin(base)
            .select(
                F.pmod(F.col("u") + F.col("id") * step, F.lit(off)).alias("a"),
                F.pmod(F.col("v") + F.col("id") * step, F.lit(off)).alias("b"),
            )
            .where(F.col("a") != F.col("b"))
        )
        return shifted.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        ).distinct()

    graphs = [
        ("base 1x", base),
        ("disjoint 10x", disjoint(10)),
        ("rotated 10x", rotated(10)),
    ]

    for op_label, run in (
        ("q_kcore loop", lambda e: G.kcore(e).agg(
            F.count(F.lit(1)).alias("core_vertices")).first()[0]),
        ("q_label_prop loop", lambda e: G.label_prop(e).agg(
            F.countDistinct("label").alias("communities")).first()[0]),
    ):
        print(f"\n### {op_label}")
        print("| graph | edges m | result | shuffle write (MB) | wall (s) |")
        print("|---|---|---|---|---|")
        for label, edges in graphs:
            e = edges.localCheckpoint(eager=True)
            m = e.count()
            snap0 = settled_snapshot(spark)
            t0 = time.perf_counter()
            result = run(e)
            wall = time.perf_counter() - t0
            d = shuffle_delta(snap0, settled_snapshot(spark))
            mb = d["shuffle_write_bytes"] / 1048576
            print(
                f"| {label} | {m:,} | {result:,} | {mb:.2f} | {wall:.2f} |",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
