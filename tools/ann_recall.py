"""Measure recall@k of the ANN variants against the exact cosine top-k
baseline and emit the ANN_RECALL.md table.

Usage: python tools/ann_recall.py [sf_dir ...]   (default sf0.1 + sf0.01)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import SparkSession

    from matrix_multiplication_bigdata_ind_assignments_spark.operators import (
        similarity as S,
    )

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/root/testdata/sf0.01"]
    print("| sf_dir | variant | recall@5 | scan fraction | wall (s) |")
    print("|---|---|---|---|---|")
    for sf in sf_dirs:
        exact = {(r.query_id, r.neighbor_id) for r in S.q_cosine_topk(spark, sf).collect()}
        n_corpus = spark.read.parquet(f"{sf}/embeddings.parquet").count()
        for name, fn in (("lsh", S.q_ann_lsh), ("ivf", S.q_ann_ivf), ("pq", S.q_ann_pq)):
            t0 = time.time()
            approx = {(r.query_id, r.neighbor_id) for r in fn(spark, sf).collect()}
            wall = time.time() - t0
            recall = len(exact & approx) / len(exact)
            if name == "lsh":
                # candidate rows the index actually surfaces, as a fraction
                # of a 10-query brute-force scan — LSH's efficiency axis
                from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

                n_cand = S._lsh_candidates(S._normed(load(spark, sf, "embeddings"))).count()
                frac = f"{n_cand / (10 * n_corpus):.0%}"
            else:
                frac = "—"
            print(f"| {sf} | {name} | {recall:.3f} | {frac} | {wall:.1f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
