"""Skew-adversarial arm for the dedup growth probes (VERDICT r11
item 4): the disjoint/rotated arms prove volume and densification, but
neither stresses HOT KEYS.  This probe plants one shared template in 30%
of every copy's docs — UNTAGGED, so unlike the growth probe's disjoint
copies the template bucket keeps growing with the decade: one mega
band-bucket / posting / pigeonhole bucket of width 0.3·N·k.

What each pipeline must do with it:

- **q_dedup_ngram_jaccard** (drop-hot-then-correct): template shingles'
  posting width crosses the cap → they are EXCLUDED from candidate
  generation, so the would-be quadratic C(0.3·N·k, 2) template pair
  list never forms (pure-boilerplate pairs, the documented loss class
  exact dedup owns); the 70% tagged remainder pairs normally.  Claim:
  max width ENTERING the pair join stays ≤ cap and shuffle stays
  ~linear per decade while the raw posting width grows 10× per decade.
- **q_dedup_simhash_c6** (exact recall, deliberately uncapped): the
  template docs share one fingerprint, so the mega bucket emits ALL
  C(W,2) true near-dup pairs — required output, not a defect.  Claim:
  the quadratic blow-up is candidate-stream COMPUTE inside the join
  stage (streamed into the count agg), never shuffle: index bytes grow
  linearly while candidates grow 100× per decade, and the
  first-untouched-block emission keeps the 20× combo duplication out
  of the stream.

Base fixture sf0.01 (500 docs → hot widths 150/1.5k/15k across
1×/10×/100×) and a probe-scoped MMBD_LSH_BUCKET_CAP=1000 so the cap
engages from the 10× decade on; production keeps the 10k default — the
knob exists precisely to place the cap relative to corpus width.

Usage: python tools/dedup_skew_probe.py [sf_dir] [k1,k2,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ["MMBD_LSH_BUCKET_CAP"] = "1000"

from pyspark.sql import functions as F  # noqa: E402

HOT_FRAC_MOD = 10  # doc_id % 10 < 3 → 30% of docs carry the template
HOT_FRAC_LT = 3
TEMPLATE = " ".join(f"boiler{i} plate{i} legal{i}" for i in range(16))  # 48 tokens


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ks = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["10", "100"])]

    from matrix_multiplication_bigdata_ind_assignments_spark.functions.metrics import (
        settled_snapshot,
        shuffle_delta,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.dedup import (
        _shingle_rows,
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.session import get_spark
    from matrix_multiplication_bigdata_ind_assignments_spark.sources.io import load

    spark = get_spark(
        "dedup-skew-probe",
        cpus="32",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "40000",
            "spark.ui.retainedJobs": "40000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = load(spark, sf_dir, "documents").select("doc_id", "text")
    off = base.agg(F.max("doc_id")).first()[0] + 1

    def blowup(k: int):
        """k node-shifted copies; 30% of each copy = the ONE untagged
        template (the growing mega bucket), 70% per-copy tagged text
        (disjoint, the growth-probe transform)."""
        tag = F.concat(F.lit("c"), F.col("id").cast("string"), F.lit("x"))
        tagged = F.concat(tag, F.regexp_replace("text", " ", F.concat(F.lit(" "), tag)))
        return (
            spark.range(k)
            .crossJoin(base)
            .select(
                (F.col("doc_id") + F.col("id") * off).alias("doc_id"),
                F.when(F.col("doc_id") % HOT_FRAC_MOD < HOT_FRAC_LT, F.lit(TEMPLATE))
                .otherwise(tagged)
                .alias("text"),
            )
            .localCheckpoint(eager=True)
        )

    arms = [("base 1x", 1, blowup(1))] + [(f"skew {k}x", k, blowup(k)) for k in ks]

    cap = int(os.environ["MMBD_LSH_BUCKET_CAP"])
    print(f"### ngram_jaccard under a growing shared template (cap={cap})")
    print(
        "| corpus | docs | max posting width (raw) | max width into join |"
        " pairs | template pairs | shuffle write (MB) | wall (s) |"
    )
    print("|---|---|---|---|---|---|---|---|")
    is_hot = lambda c: (F.col(c) % HOT_FRAC_MOD) < HOT_FRAC_LT  # noqa: E731
    for label, k, docs in arms:
        nd = docs.count()
        sh = _shingle_rows(docs).select(
            "doc_id",
            F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long").alias("h"),
        )
        widths = sh.groupBy("h").agg(F.count(F.lit(1)).alias("w"))
        raw_w = widths.agg(F.max("w")).first()[0]
        join_w = (
            widths.where(F.col("w") <= cap).agg(F.max("w")).first()[0]
            if raw_w > cap
            else raw_w
        )
        snap0 = settled_snapshot(spark)
        t0 = time.perf_counter()
        row = (
            ngram_jaccard_pairs(docs)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(is_hot("da") & is_hot("db"), 1)).alias("tpl"),
            )
            .first()
        )
        wall = time.perf_counter() - t0
        mb = shuffle_delta(snap0, settled_snapshot(spark))["shuffle_write_bytes"] / 1048576
        print(
            f"| {label} | {nd:,} | {raw_w:,} | {join_w:,} | {row['n']:,} |"
            f" {row['tpl']:,} | {mb:.2f} | {wall:.2f} |",
            flush=True,
        )

    print()
    print("### simhash c6 under the same template (uncapped by design)")
    print(
        "| corpus | docs | max bucket width | pairs | template pairs |"
        " shuffle write (MB) | wall (s) |"
    )
    print("|---|---|---|---|---|---|---|")
    for label, k, docs in arms:
        nd = docs.count()
        snap0 = settled_snapshot(spark)
        t0 = time.perf_counter()
        # bucket widths from the probe's own index recompute (cheap agg)
        from matrix_multiplication_bigdata_ind_assignments_spark.operators.dedup import (
            simhash_fingerprints,
        )

        max_w = (
            simhash_fingerprints(docs)
            .groupBy("simhash")
            .agg(F.count(F.lit(1)).alias("w"))
            .agg(F.max("w"))
            .first()[0]
        )
        row = (
            simhash_pairs(docs, blocks=6)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(is_hot("da") & is_hot("db"), 1)).alias("tpl"),
            )
            .first()
        )
        wall = time.perf_counter() - t0
        mb = shuffle_delta(snap0, settled_snapshot(spark))["shuffle_write_bytes"] / 1048576
        print(
            f"| {label} | {nd:,} | {max_w:,} | {row['n']:,} | {row['tpl']:,} |"
            f" {mb:.2f} | {wall:.2f} |",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
