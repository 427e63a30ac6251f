#!/usr/bin/env python
"""Strong-scaling harness: the reference's Stage-3 experiment run on the
engine itself (VERDICT r11 item 1).

The reference's central Stage-3 artifact is the speedup/efficiency-vs-
threads table (`Stage 3/Python Implementation/mm_opt_par.py:43-86`, CSVs
at p=1,2,4,8) — whose speedup column is famously broken because each
process recomputed its own baseline.  This tool benches ~10 headline
engine queries at local[1,2,4,8,16,32] on sf0.1 and derives
speedup/efficiency THROUGH the engine's own q_speedup_efficiency
operator (operators/aggregates.py speedup_efficiency — the fixed,
windowed form), then cross-checks the derived columns against a plain
Python recompute of T1/Tp so the table provably matches the raw times.

Each core count runs in a FRESH subprocess (one JVM per local[p] —
Spark's master is fixed at session start), with its own GEMM noise
sentinel + loadavg pair for provenance (the bench.py discipline).

Usage:
  python tools/strong_scaling.py                 # full sweep → BENCH_scaling.json
  python tools/strong_scaling.py --cores 1,4,32  # subset
  python tools/strong_scaling.py --child 8 /root/testdata/sf0.1  # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CORES_DEFAULT = [1, 2, 4, 8, 16, 32]
SF_DIR_DEFAULT = "/root/testdata/sf0.1"

#: headline set (VERDICT r11 item 1's list): the two blocked-GEMM rows,
#: the sparse kernel, a COO-join kernel, the star join, the banded
#: simhash dedup, the iterative PageRank loop, the 3-stage curation DAG,
#: plus the scan-family wordcount and the two-pass prefix-sum packer —
#: a cross-section of Arrow-kernel, shuffle-join, iterative and
#: composite shapes, so the curve shows WHICH shapes scale, not one.
QUERIES = [
    "matmul_join_n256",
    "matmul_blocked_n1024",
    "matmul_blocked_n4096_3d",
    "spmm_sparse_n2048_d05",
    "q_star_join",
    "q_dedup_simhash_c6",
    "q_pagerank",
    "q_corpus_clean_strict",
    "q_wordcount",
    "q_sequence_pack",
]


def gemm_sentinel() -> float:
    """bench.py's fixed 3× 1024³ GEMM box-load reference (warmed)."""
    import numpy as np

    a = np.ones((1024, 1024))
    a = a @ a / 1024.0
    t0 = time.perf_counter()
    for _ in range(3):
        a = a @ a / 1024.0
    return round(time.perf_counter() - t0, 3)


def child(cores: int, sf_dir: str) -> None:
    """Run the query set at local[cores]; print one JSON line."""
    os.environ["MMBD_SHUFFLE_PARTITIONS"] = str(2 * cores)
    # Pin BLAS to one thread per Python worker: the Arrow GEMM kernels
    # otherwise let numpy grab EVERY host core regardless of local[p] —
    # measured in the first r12 sweep: matmul_blocked_n4096_3d was flat
    # 28-32 s from p=1 to p=8 (hidden all-core BLAS inside 1-8 workers)
    # then THRASHED at p=32 (32 workers × all-core BLAS oversubscription:
    # 23.8 s vs 14.9 s at p=16).  With BLAS pinned, compute parallelism
    # comes only from Spark task slots — the thing a strong-scaling
    # curve of the ENGINE is supposed to measure.  (bench.py leaves BLAS
    # free because it benches one fixed p=32 configuration.)
    from pyspark.sql import functions as F

    from matrix_multiplication_bigdata_ind_assignments_spark import registry
    from matrix_multiplication_bigdata_ind_assignments_spark.operators import matrix as M
    from matrix_multiplication_bigdata_ind_assignments_spark.session import get_spark

    import bench as B

    spark = get_spark("mmbd-scaling", cpus=cores)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # operands cached outside the clock, exactly as bench.py does
    A256 = B.mat_from_lineitem(spark, sf_dir, 256).cache()
    B256 = B.mat_from_lineitem(spark, sf_dir, 256, shift=7).cache()
    A1024 = B.mat_from_lineitem(spark, sf_dir, 1024).cache()
    B1024 = B.mat_from_lineitem(spark, sf_dir, 1024, shift=7).cache()
    A2048 = B.mat_from_lineitem(spark, sf_dir, 2048).where(
        "(i * 2048 + j) % 20 = 0"
    ).cache()
    B2048 = B.mat_from_lineitem(spark, sf_dir, 2048, shift=7).cache()
    A4096 = B.mat_from_lineitem(spark, sf_dir, 4096).cache()
    B4096 = B.mat_from_lineitem(spark, sf_dir, 4096, shift=7).cache()
    for m in (A256, B256, A1024, B1024, A2048, B2048, A4096, B4096):
        m.count()
    # spin up the Python worker pool outside the clock (bench.py note)
    A256.repartition(cores).groupBy("i").applyInPandas(
        lambda pdf: pdf, schema=A256.schema
    ).write.format("noop").mode("overwrite").save()

    def run_mm(thunk):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(cores))
        try:
            run(thunk())
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    benches = {
        "matmul_join_n256": lambda: run_mm(lambda: M.multiply(A256, B256, strategy="join")),
        "matmul_blocked_n1024": lambda: run_mm(
            lambda: M.multiply(A1024, B1024, strategy="blocked", block_size=512)
        ),
        "matmul_blocked_n4096_3d": lambda: run_mm(
            lambda: M.multiply(
                A4096, B4096, strategy="blocked", block_size=2048, panel_bytes=32 << 20
            )
        ),
        "spmm_sparse_n2048_d05": lambda: run_mm(
            lambda: M.multiply(A2048, B2048, strategy="join")
        ),
    }
    for name in QUERIES:
        if name not in benches:
            benches[name] = (lambda nm: lambda: run(qs[nm](spark, sf_dir)))(name)

    sentinel_start, load_start = gemm_sentinel(), os.getloadavg()[0]
    timings = {}
    for name in QUERIES:
        thunk = benches[name]
        thunk()  # one untimed warm-up (codegen + worker pool, bench.py discipline)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            thunk()
            times.append(time.perf_counter() - t0)
        timings[name] = round(min(times), 3)
    out = {
        "p": cores,
        "queries": timings,
        "sentinel": [sentinel_start, gemm_sentinel()],
        "loadavg": [round(load_start, 1), round(os.getloadavg()[0], 1)],
    }
    print("SCALING_CHILD " + json.dumps(out, separators=(",", ":")))


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "--child":
        child(int(args[1]), args[2] if len(args) > 2 else SF_DIR_DEFAULT)
        return 0

    cores = CORES_DEFAULT
    if "--cores" in args:
        cores = [int(c) for c in args[args.index("--cores") + 1].split(",")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF_DIR_DEFAULT)

    results = {}
    for p in cores:
        print(f"== local[{p}] ==", file=sys.stderr, flush=True)
        env = dict(
            os.environ,
            OPENBLAS_NUM_THREADS="1",
            OMP_NUM_THREADS="1",
            MKL_NUM_THREADS="1",
        )
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(p), sf_dir],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            env=env,
        )
        line = next(
            (l for l in r.stdout.splitlines() if l.startswith("SCALING_CHILD ")), None
        )
        if line is None:
            print(r.stdout[-2000:], file=sys.stderr)
            print(r.stderr[-4000:], file=sys.stderr)
            raise RuntimeError(f"child local[{p}] produced no record")
        results[p] = json.loads(line[len("SCALING_CHILD "):])
        print(
            f"   {json.dumps(results[p]['queries'], separators=(',', ':'))}",
            file=sys.stderr,
            flush=True,
        )

    # Derive speedup/efficiency THROUGH the engine's own operator.
    from pyspark.sql import functions as F  # noqa: F401

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.aggregates import (
        speedup_efficiency,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.session import get_spark

    spark = get_spark("mmbd-scaling-derive", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = [
        (q, p, results[p]["queries"][q]) for p in cores for q in QUERIES
    ]
    per_run = spark.createDataFrame(rows, "query string, p int, t double")
    derived = [
        r.asDict()
        for r in speedup_efficiency(per_run, "query", "p", "t").orderBy("query", "p").collect()
    ]
    # Cross-check: the operator's columns must equal a plain recompute of
    # T1/Tp from the raw child records.  Tolerance is the 6-dp rounding
    # grain (5e-7 + fp slack), NOT exact-match against Python's round():
    # Spark rounds HALF_UP while Python banker-rounds, and the first r12
    # run died on exactly that half-ulp (0.8098675 → 0.809868 vs .809867).
    t1 = {q: results[cores[0]]["queries"][q] for q in QUERIES}
    for d in derived:
        want_s = t1[d["query"]] / d["t"]
        assert abs(d["speedup"] - want_s) <= 5.1e-7, d
        assert abs(d["efficiency"] - want_s / d["p"]) <= 5.1e-7, d

    record = {
        "metric": "strong_scaling",
        "unit": "sec",
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[1]),
        "cores": cores,
        "method": "min_over_2_repeats_after_1_warmup; fresh JVM per core count;"
        " shuffle_partitions=2p (matmul rows pinned to p, the bench.py rule);"
        " derived table computed by operators/aggregates.py speedup_efficiency"
        " (q_speedup_efficiency's engine) and asserted equal to a plain T1/Tp"
        " recompute",
        "queries": {q: {str(p): results[p]["queries"][q] for p in cores} for q in QUERIES},
        "derived": derived,
        "provenance": {
            str(p): {"sentinel": results[p]["sentinel"], "loadavg": results[p]["loadavg"]}
            for p in cores
        },
    }
    path = "/root/repo/BENCH_scaling.json"
    with open(path, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(f"wrote {path}", file=sys.stderr)

    # Markdown table for SCALING.md
    pmax = cores[-1]
    print(
        "| query | "
        + " | ".join(f"p={p}" for p in cores)
        + f" | S({pmax}) | E({pmax}) |"
    )
    print("|" + "---|" * (len(cores) + 3))
    by_q = {q: {d["p"]: d for d in derived if d["query"] == q} for q in QUERIES}
    for q in QUERIES:
        cells = " | ".join(f"{results[p]['queries'][q]:.2f}" for p in cores)
        last = by_q[q][cores[-1]]
        print(f"| {q} | {cells} | {last['speedup']:.2f}× | {last['efficiency']:.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
