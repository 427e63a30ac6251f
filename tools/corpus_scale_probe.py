"""End-to-end 10× corpus probe for q_corpus_clean_strict (VERDICT r8
item 7): the per-stage probes exist (dedup candidates ~linear, LM model
constant); this composes them — one 10× documents blow-up pushed through
the FULL strict pipeline, per-stage shuffle bytes recorded.  The closest
local proxy to the 100 TB ingest claim.

Blow-up: 10 doc_id-shifted copies; copy k > 0 gets a distinct 2-token
prefix ("copyk dup ") so EXACT dedup cannot collapse the copies (their
md5(text) differ) and the load lands where a real crawl's near-duplicate
boilerplate lands: on the ALIGNMENT-FREE rolling-span stage, whose
20-gram hashes match at any offset and collapse the repeated content.
Stages measured separately (inputs checkpointed so each window isolates
one stage):

1. quality filter + exact dedup keep-first (one window shuffle on
   md5(text));
2. rolling-20-gram span dedup over the survivors (the strided kernel);
3. per-language token-yield rollup (join + partial agg).

Usage: python tools/corpus_scale_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from matrix_multiplication_bigdata_ind_assignments_spark.functions.metrics import (
        measure_shuffle,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.dedup import (
        span_dedup_rolling,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.pipeline import (
        _CLEAN_QUALITY_MIN,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.session import get_spark
    from matrix_multiplication_bigdata_ind_assignments_spark.sources.io import load

    spark = get_spark(
        "corpus-scale-probe",
        cpus="32",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "40000",
            "spark.ui.retainedJobs": "40000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    base = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars", "text")
    off = base.agg(F.max("doc_id")).first()[0] + 1

    def blow_up(k: int):
        if k == 1:
            return base
        return (
            spark.range(k)
            .crossJoin(base)
            .select(
                (F.col("doc_id") + F.col("id") * off).alias("doc_id"),
                "lang",
                "n_chars",
                F.when(F.col("id") == 0, F.col("text"))
                .otherwise(F.concat(F.concat_ws("", F.lit("copy"), F.col("id")), F.lit(" dup "), F.col("text")))
                .alias("text"),
            )
        )

    print("| scale | stage | rows in | rows out | shuffle write (MB) | wall (s) |")
    print("|---|---|---|---|---|---|")
    for scale in (1, 10):
        docs = blow_up(scale).localCheckpoint(eager=True)
        n_in = docs.count()

        toks = F.filter(F.split("text", " "), lambda x: x != "")
        n_toks = F.size(toks).cast("double")
        n_punct = F.size(F.regexp_extract_all("text", F.lit("[^a-z0-9 ]"), 0)).cast("double")
        sw = F.size(F.filter(toks, lambda x: x.isin("the", "a", "of", "and", "to"))).cast("double")
        quality = (
            0.4 * F.least(n_toks / 100.0, F.lit(1.0))
            + 0.3 * (1 - n_punct / F.greatest(F.col("n_chars").cast("double"), F.lit(1.0)))
            + 0.3 * (sw / F.greatest(n_toks, F.lit(1.0)))
        )
        w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
        clean = None

        def stage1():
            nonlocal clean
            clean = (
                docs.where(quality >= _CLEAN_QUALITY_MIN)
                .withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select("doc_id", "lang", "text")
                .localCheckpoint(eager=True)
            )

        t0 = time.perf_counter()
        d1 = measure_shuffle(spark, stage1)
        w1 = time.perf_counter() - t0
        n_clean = clean.count()
        print(
            f"| {scale}x | 1 quality+exact-dedup | {n_in:,} | {n_clean:,} |"
            f" {d1['shuffle_write_bytes'] / 1048576:.2f} | {w1:.2f} |",
            flush=True,
        )

        spans = None

        def stage2():
            nonlocal spans
            spans = span_dedup_rolling(clean.select("doc_id", "text")).localCheckpoint(
                eager=True
            )

        t0 = time.perf_counter()
        d2 = measure_shuffle(spark, stage2)
        w2 = time.perf_counter() - t0
        kept, dropped = spans.agg(F.sum("n_kept"), F.sum("n_dropped")).first()
        print(
            f"| {scale}x | 2 rolling-span dedup | {n_clean:,} | kept {kept:,} / dropped {dropped:,} tok |"
            f" {d2['shuffle_write_bytes'] / 1048576:.2f} | {w2:.2f} |",
            flush=True,
        )

        def stage3():
            run(
                spans.join(clean.select("doc_id", "lang"), "doc_id")
                .groupBy("lang")
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_kept").cast("long").alias("tokens_kept"),
                    F.sum("n_dropped").cast("long").alias("tokens_dropped"),
                )
            )

        t0 = time.perf_counter()
        d3 = measure_shuffle(spark, stage3)
        w3 = time.perf_counter() - t0
        print(
            f"| {scale}x | 3 yield rollup | {n_clean:,} | per-lang |"
            f" {d3['shuffle_write_bytes'] / 1048576:.2f} | {w3:.2f} |",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
