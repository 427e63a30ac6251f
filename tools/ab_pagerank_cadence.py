"""Same-session interleaved A/B: PageRank lineage-truncation cadence.

Claim under test: the per-iteration eager localCheckpoint (cadence 1)
spends most of an iteration's wall time on job scheduling + broadcast
rounds, not compute — so truncating every k-th iteration (identical
12-dp bits, rounding is in-plan) should cut wall time at fixture scale.

Method (the AB_BLOCKED.md discipline): arms interleaved within ONE
session, min + mean over reps reported per arm, rank checksum asserted
identical across arms so the speed knob can't silently change results.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cadences = [1, 2, 5]

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.graph import (
        pagerank,
        trade_edges,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.session import get_spark

    spark = get_spark()
    edges = trade_edges(spark, sf_dir).localCheckpoint(eager=True)
    edges.count()  # build once, outside every timed window

    sums: dict[int, list[float]] = {c: [] for c in cadences}
    times: dict[int, list[float]] = {c: [] for c in cadences}
    for rep in range(reps):
        for c in cadences:  # interleaved: box drift hits every arm alike
            from pyspark.sql import functions as F

            t0 = time.perf_counter()
            ranks = pagerank(spark, edges, truncate_every=c)
            # bit-level equality probe: hash over (node, 12-dp rank) pairs
            chk = ranks.agg(F.sum(F.hash("node", "rank")).alias("h")).collect()[0]["h"]
            times[c].append(time.perf_counter() - t0)
            sums[c].append(chk)
            print(f"rep {rep} cadence {c}: {times[c][-1]:.2f}s hash={chk}", flush=True)

    assert len({tuple(v) for v in sums.values()}) == 1, f"arms disagree: {sums}"
    print("\n| cadence | min (s) | mean (s) |")
    print("|---|---|---|")
    for c in cadences:
        ts = times[c]
        print(f"| {c} | {min(ts):.2f} | {sum(ts) / len(ts):.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
