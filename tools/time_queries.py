#!/usr/bin/env python
"""Targeted per-query timer for optimization iterations: same
methodology as bench.py (tuned session, noop sink, 1 warmup + min/mean
of N repeats, mini-GEMM contention sentinel per query) but over an
explicit query list, so a single change can be measured in ~a minute
instead of a full bench pass.

Usage: python tools/time_queries.py [--sf DIR] [--repeats N] q_a q_b ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mini_sentinel() -> float:
    import numpy as np

    a = np.ones((1024, 1024))
    a = a @ a / 1024.0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        a = a @ a / 1024.0
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    repeats = 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--repeats":
            repeats = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("MMBD_SHUFFLE_PARTITIONS", str(2 * int(cpus)))

    from matrix_multiplication_bigdata_ind_assignments_spark import registry
    from matrix_multiplication_bigdata_ind_assignments_spark.session import get_spark

    spark = get_spark("mmbd-timeq", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    def run(name):
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in names:
        spark.sparkContext.setJobDescription(f"time: {name}")
        run(name)  # warmup
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            run(name)
            times.append(time.perf_counter() - t0)
        s = mini_sentinel()
        print(
            f"{min(times):8.3f}s min  {sum(times)/len(times):8.3f}s mean  "
            f"sentinel {s:.4f}s  {name}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
