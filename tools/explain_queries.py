#!/usr/bin/env python
"""Capture .explain("formatted") + executed job/shuffle evidence for a
query list into plans/<tag>/<query>_<suffix>.txt (the optimization-round
plan audit files).

For the eager iterative operators (graph loops, Lloyd trainers) the
RETURNED frame explains as a bare ExistingRDD scan — the interesting
work happens in jobs launched while BUILDING it — so alongside the plan
this records: number of Spark jobs launched, total tasks, and shuffle
read/write MB around one full execution (noop sink), which is where a
job-count optimization (skipped certificate, early-stopped round) shows.

Usage: python tools/explain_queries.py --tag r12 --suffix before q_a q_b ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    tag, suffix, sf_dir = "r12", "before", "/root/testdata/sf0.1"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--tag":
            tag = args[i + 1]; i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]; i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("MMBD_SHUFFLE_PARTITIONS", str(2 * int(cpus)))

    from matrix_multiplication_bigdata_ind_assignments_spark import registry
    from matrix_multiplication_bigdata_ind_assignments_spark.functions.metrics import (
        settled_snapshot,
        shuffle_delta,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.session import get_spark

    spark = get_spark(
        "mmbd-explain",
        cpus=cpus,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "40000",
            "spark.ui.retainedJobs": "40000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for name in names:
        sc.setJobGroup(f"explain:{name}", name)
        jobs0 = set(tracker.getJobIdsForGroup(f"explain:{name}"))
        snap0 = settled_snapshot(spark)
        df = qs[name](spark, sf_dir)  # building may itself run jobs (eager loops)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        df.write.format("noop").mode("overwrite").save()
        d = shuffle_delta(snap0, settled_snapshot(spark))
        jobs1 = set(tracker.getJobIdsForGroup(f"explain:{name}"))
        # clearJobGroup is the supported clear API (ADVICE r12 —
        # setJobGroup(None, None) relies on py4j accepting null ids);
        # PySpark's SparkContext doesn't surface it, so call the
        # JavaSparkContext method directly
        sc._jsc.clearJobGroup()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — .explain('formatted') at sf_dir={sf_dir}\n")
            f.write(
                f"# executed evidence (one full run incl. building the frame):\n"
                f"#   spark jobs launched: {len(jobs1 - jobs0)}\n"
                f"#   shuffle read MB: {d['shuffle_read_bytes'] / 1048576:.2f}"
                f"  write MB: {d['shuffle_write_bytes'] / 1048576:.2f}\n"
                f"#   spill mem MB: {d['spill_memory_bytes'] / 1048576:.2f}"
                f"  disk MB: {d['spill_disk_bytes'] / 1048576:.2f}\n"
            )
            f.write(plan)
            f.write("\n")
        print(f"wrote {path} (jobs={len(jobs1 - jobs0)}, "
              f"shuffle_w={d['shuffle_write_bytes']/1048576:.1f}MB)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
