"""Triangle-count EDGE-GROWTH probe (VERDICT r8 item 6): SCALING.md has
the orientation-skew probe (hub wedge blow-up, tri_skew_probe.py) but no
edge-growth byte row like PageRank's.  This blows the co-supply graph up
~10x two ways and records edges m, wedge volume, wedges/m^1.5 (the
Suri-Vassilvitskii bound the degree orientation promises), shuffle
bytes, and wall for the full q_triangle_count pipeline:

- ``disjoint``: 10 node-shifted copies — m grows 10x, structure
  per-component unchanged (wedges should track m linearly, i.e. the
  bound ratio should FALL: m^1.5 grows 31.6x);
- ``rotated``: 10 edge-rotated copies over the SAME node set
  (canonicalized, deduped) — densification, the adversarial direction
  for wedge growth (degrees rise, wedge work may grow superlinearly in
  m but must stay under the m^1.5 envelope).

Usage: python tools/tri_growth_probe.py [sf_dir]
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
        "tri-growth-probe",
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
            .select((F.col("u") + F.col("id") * off).alias("u"), (F.col("v") + F.col("id") * off).alias("v"))
        )

    def rotated(k: int):
        # copy j: both endpoints shifted by j·step mod the node space,
        # canonicalized to u < v, deduped — same nodes, ~k× the edges
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

    print("| graph | edges m | wedges | wedges/m^1.5 | triangles | shuffle write (MB) | wall (s) |")
    print("|---|---|---|---|---|---|---|")
    for label, edges in (
        ("base 1x", base),
        ("disjoint 10x", disjoint(10)),
        ("rotated 10x", rotated(10)),
    ):
        e = edges.localCheckpoint(eager=True)
        m = e.count()
        wedges = G.oriented_wedges(e, "degree")[2].count()
        snap0 = settled_snapshot(spark)
        t0 = time.perf_counter()
        out = G.triangle_counts(e)
        tri_total = out.agg((F.sum("tri") / 3).cast("long")).first()[0]
        wall = time.perf_counter() - t0
        d = shuffle_delta(snap0, settled_snapshot(spark))
        mb = d["shuffle_write_bytes"] / 1048576
        print(
            f"| {label} | {m:,} | {wedges:,} | {wedges / m**1.5:.4f} |"
            f" {tri_total:,} | {mb:.2f} | {wall:.2f} |",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
