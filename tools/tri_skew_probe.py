"""Triangle-count orientation skew probe: measure the 'curse of the
last reducer' on a hub-and-communities graph.

The graph is a star (one hub, H spokes, hub id 0 so the naive id order
sorts it LOW and fans its edges OUT) unioned with T disjoint triangles.
Both orientation arms of triangle_counts count identically (asserted);
what differs is wedge volume — the naive id orientation charges the hub
C(H,2) wedges, the degree orientation charges it ZERO, so degree-arm
wedge work stays flat as the hub grows while the naive arm grows
quadratically.  That measured gap is the load-balance claim
q_triangle_count's docstring makes, at the scale where it matters: on a
1000-executor cluster one mega-hub task IS the job's critical path.

Results go to SCALING.md.  Usage: python tools/tri_skew_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def star_plus_triangles(spark, hub_deg: int, n_tri: int):
    """Hub 0 — spokes 1..H, plus T disjoint triangles above id H."""
    spokes = spark.range(1, hub_deg + 1).select(
        F.lit(0).cast("long").alias("u"), F.col("id").alias("v")
    )
    base = spark.range(n_tri).select((hub_deg + 1 + 3 * F.col("id")).alias("a"))
    tris = (
        base.select(F.col("a").alias("u"), (F.col("a") + 1).alias("v"))
        .unionAll(base.select(F.col("a").alias("u"), (F.col("a") + 2).alias("v")))
        .unionAll(base.select((F.col("a") + 1).alias("u"), (F.col("a") + 2).alias("v")))
    )
    return spokes.unionAll(tris)


def main() -> int:
    from matrix_multiplication_bigdata_ind_assignments_spark.operators import graph as G
    from matrix_multiplication_bigdata_ind_assignments_spark.session import get_spark

    spark = get_spark("tri-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    n_tri = 2000
    print("| hub degree | arm | wedges | triangles found | wall (s) |")
    print("|---|---|---|---|---|")
    for hub_deg in (500, 1000, 2000, 4000):
        edges = star_plus_triangles(spark, hub_deg, n_tri).localCheckpoint(eager=True)
        totals = {}
        for orient in ("degree", "id"):
            t0 = time.time()
            _, _, wedges = G.oriented_wedges(edges, orient)
            n_wedges = wedges.count()
            out = G.triangle_counts(edges, orient=orient)
            n_corners = out.agg(F.sum("tri")).first()[0]
            wall = time.time() - t0
            totals[orient] = n_corners
            print(
                f"| {hub_deg} | {orient} | {n_wedges:,} | {n_corners // 3:,} "
                f"| {wall:.2f} |"
            )
        assert totals["degree"] == totals["id"] == 3 * n_tri, totals
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
