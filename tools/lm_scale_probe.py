"""LM-model scale probe: the vocab/stream asymmetry claim, measured.

q_lm_perplexity's (and q_quality_classifier's) 100 TB posture rests on
one asymmetry: the token STREAM grows with the corpus while the
MODEL (the vocab → logprob table) grows sublinearly (Heaps' law) —
so the model join broadcasts and the only corpus-sized work is two
map-side-combinable hash aggs.  This probe measures that shape on a
10× corpus blow-up (shifted doc_id copies, text unchanged — the
vocab-constant regime where the asymmetry is starkest): stream tokens
must grow 10×, vocab rows 1×, and shuffle bytes must track the DOC
dimension (the per-doc agg), never tokens × vocab.

Results go to SCALING.md.  Usage: python tools/lm_scale_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    from matrix_multiplication_bigdata_ind_assignments_spark.functions.metrics import measure_shuffle
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.text import lm_perplexity_frame
    from matrix_multiplication_bigdata_ind_assignments_spark.session import get_spark
    from matrix_multiplication_bigdata_ind_assignments_spark.sources.io import load

    spark = get_spark(
        "lm-scale-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "40000",
            "spark.ui.retainedJobs": "40000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = load(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")

    print("| scale | docs | stream tokens | vocab rows | shuffle (KB) | wall (s) |")
    print("|---|---|---|---|---|---|")
    for k in (1, 10):
        docs = base
        for c in range(1, k):
            docs = docs.unionByName(
                base.select((F.col("doc_id") + F.lit(c * 1_000_000)).alias("doc_id"), "text")
            )
        docs = docs.localCheckpoint(eager=True)  # blow-up cost outside the window
        n_docs = docs.count()
        toks = docs.select(
            F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("token")
        )
        n_stream = toks.count()
        n_vocab = toks.distinct().count()

        def run():
            lm_perplexity_frame(docs).write.format("noop").mode("overwrite").save()

        run()  # warm
        t0 = time.time()
        d = measure_shuffle(spark, run)
        wall = time.time() - t0
        print(
            f"| {k}× | {n_docs:,} | {n_stream:,} | {n_vocab:,} "
            f"| {d['shuffle_write_bytes'] // 1024:,} | {wall:.2f} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
