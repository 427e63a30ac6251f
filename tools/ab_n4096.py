"""Same-session settlement of the `matmul_blocked_n4096_3d` drift
(VERDICT r8 item 1: min 7.76 s r7 quiet-box -> 11.75 s r8 quiet-box with
bit-identical 156.66 MB shuffle).

The r7-vs-HEAD "A/B" degenerates: `git diff a7849ab..HEAD --
pkg/operators/matrix.py pkg/session.py` is EMPTY — the kernel, the
session confs, and the bench thunk (strategy='blocked', block_size=2048,
panel_bytes=32<<20, shuffle partitions pinned to cpus) are byte-identical
code, so there is no second arm to alternate.  What CAN move between
records is only the environment.  This tool therefore measures the one
thing left to measure: the same-session timing DISTRIBUTION of the exact
bench thunk, bracketed by noise sentinels, with shuffle bytes captured
per rep to prove the plan is constant while the wall time moves.

Interpretation contract (written into AB_N4096.md):
- identical shuffle bytes across all reps  -> plan constant (it must be:
  the code is unchanged);
- same-session spread (max/min over reps)  -> today's noise band for
  this row;
- if the session min lands near r7's 7.76 s, the r8 11.75 s record was a
  loaded-box sample from the same distribution; if the min stays high on
  a quiet sentinel, something persistent (BLAS/thermal/kernel) moved —
  but either way NOT a repo regression, by the git evidence.

Usage: python tools/ab_n4096.py [reps] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def sentinel() -> float:
    import numpy as np

    a = np.ones((1024, 1024))
    t0 = time.perf_counter()
    for _ in range(3):
        a = a @ a / 1024.0
    return round(time.perf_counter() - t0, 3)


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    os.environ.setdefault("MMBD_SHUFFLE_PARTITIONS", "64")
    from bench import mat_from_lineitem
    from matrix_multiplication_bigdata_ind_assignments_spark.functions.metrics import (
        settled_snapshot,
        shuffle_delta,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.operators import matrix as M
    from matrix_multiplication_bigdata_ind_assignments_spark.session import get_spark

    spark = get_spark(
        "ab-n4096",
        cpus="32",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "40000",
            "spark.ui.retainedJobs": "40000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    A = mat_from_lineitem(spark, sf_dir, 4096).cache()
    B = mat_from_lineitem(spark, sf_dir, 4096, shift=7).cache()
    A.count(), B.count()
    A.repartition(32).groupBy("i").applyInPandas(lambda p: p, schema=A.schema).write.format(
        "noop"
    ).mode("overwrite").save()

    def thunk():
        # the exact bench row: shuffle partitions pinned to cpus (bench.run_mm)
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        try:
            M.multiply(A, B, strategy="blocked", block_size=2048, panel_bytes=32 << 20).write.format(
                "noop"
            ).mode("overwrite").save()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    thunk()  # one untimed warm-up (bench parity)
    s0 = sentinel()
    load0 = os.getloadavg()[0]
    rows = []
    for r in range(reps):
        snap0 = settled_snapshot(spark)
        t0 = time.perf_counter()
        thunk()
        wall = time.perf_counter() - t0
        d = shuffle_delta(snap0, settled_snapshot(spark))
        rows.append((wall, round(d["shuffle_write_bytes"] / 1048576, 2)))
        print(f"rep {r}: {wall:.3f} s, write {rows[-1][1]} MB", flush=True)
    s1 = sentinel()
    walls = [w for w, _ in rows]
    print(f"sentinel: start {s0} end {s1}; loadavg start {load0:.1f} end {os.getloadavg()[0]:.1f}")
    print(
        f"min {min(walls):.3f} mean {sum(walls) / len(walls):.3f} max {max(walls):.3f}"
        f" spread {max(walls) / min(walls):.2f}x"
    )
    print("shuffle write MB per rep:", sorted({mb for _, mb in rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
