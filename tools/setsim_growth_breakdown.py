"""Per-stage shuffle breakdown for jaccard_prefix_pairs at the growth
probe's disjoint-copy scales — run when the aggregate probe shows a
superlinear shuffle decade, to locate WHICH stage stopped scaling.

Usage: python tools/setsim_growth_breakdown.py [sf_dir] [k1,k2,...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ks = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["10", "100"])]

    from matrix_multiplication_bigdata_ind_assignments_spark.functions.metrics import (
        settled_snapshot,
        shuffle_delta,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.dedup import _shingle_rows
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.setsim import _T_DEN, _T_NUM
    from matrix_multiplication_bigdata_ind_assignments_spark.session import get_spark
    from matrix_multiplication_bigdata_ind_assignments_spark.sources.io import load

    spark = get_spark("setsim-breakdown", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")

    base = load(spark, sf_dir, "documents").select("doc_id", "text")
    off = base.agg(F.max("doc_id")).first()[0] + 1

    def blowup(k: int):
        tag = F.concat(F.lit("c"), F.col("id").cast("string"), F.lit("x"))
        return (
            spark.range(k)
            .crossJoin(base)
            .select(
                (F.col("doc_id") + F.col("id") * off).alias("doc_id"),
                F.concat(tag, F.regexp_replace("text", " ", F.concat(F.lit(" "), tag))).alias(
                    "text"
                ),
            )
            .localCheckpoint(eager=True)
        )

    tn, td = F.lit(_T_NUM), F.lit(_T_DEN)
    for k in ks:
        print(f"\n### disjoint {k}x — per-stage shuffle write (MB) / wall (s)")
        d = blowup(k)

        def stage(label, fn):
            snap0 = settled_snapshot(spark)
            t0 = time.perf_counter()
            out = fn()
            wall = time.perf_counter() - t0
            mb = shuffle_delta(snap0, settled_snapshot(spark))["shuffle_write_bytes"] / 1048576
            print(f"| {label} | {mb:10.2f} | {wall:7.2f} |", flush=True)
            return out

        sh = stage(
            "shingle+hash (ckpt)    ",
            lambda: _shingle_rows(d)
            .select(
                "doc_id",
                F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long").alias("h"),
            )
            .localCheckpoint(eager=True),
        )
        freq = stage(
            "freq groupBy(h) (ckpt) ",
            lambda: sh.groupBy("h").agg(F.count(F.lit(1)).alias("f")).localCheckpoint(eager=True),
        )
        sets = stage(
            "sets groupBy(doc) (ckpt)",
            lambda: sh.groupBy("doc_id")
            .agg(F.collect_set("h").alias("hs"), F.count(F.lit(1)).alias("sz"))
            .localCheckpoint(eager=True),
        )
        rn = Window.partitionBy("doc_id").orderBy("f", "h")
        prefix = stage(
            "prefix rank+filter (ckpt)",
            lambda: sh.join(freq, "h")
            .withColumn("rn", F.row_number().over(rn))
            .join(sets.select("doc_id", "sz"), "doc_id")
            .where(
                F.col("rn")
                <= F.expr(f"sz - (({_T_NUM} * sz + {_T_DEN - 1}) DIV {_T_DEN}) + 1")
            )
            .select("doc_id", "h", "sz", "rn")
            .localCheckpoint(eager=True),
        )
        a, b = prefix.alias("a"), prefix.alias("b")
        minov = F.expr(
            f"({_T_NUM} * (a.sz + b.sz) + {_T_NUM + _T_DEN - 1}) DIV {_T_NUM + _T_DEN}"
        )
        achievable = F.lit(1) + F.least(
            F.col("a.sz") - F.col("a.rn"), F.col("b.sz") - F.col("b.rn")
        )
        cands = stage(
            "candidate self-join     ",
            lambda: a.join(
                b,
                (F.col("a.h") == F.col("b.h"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
                & (td * F.col("a.sz") >= tn * F.col("b.sz"))
                & (td * F.col("b.sz") >= tn * F.col("a.sz"))
                & (achievable >= minov),
            )
            .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
            .agg(F.count(F.lit(1)).alias("n_shared_prefix"))
            .localCheckpoint(eager=True),
        )
        # candidate-doc prune (mirrors the operator): sets is semi-joined
        # down to candidate docs so the verify never exchanges the corpus
        cand_docs = cands.select(F.col("da").alias("doc_id")).union(
            cands.select(F.col("db").alias("doc_id"))
        )
        sets_c = sets.join(F.broadcast(cand_docs), "doc_id", "left_semi")
        sa = sets_c.select(F.col("doc_id").alias("da"), F.col("hs").alias("ha"), F.col("sz").alias("sza"))
        sb = sets_c.select(F.col("doc_id").alias("db"), F.col("hs").alias("hb"), F.col("sz").alias("szb"))
        inter = F.size(F.array_intersect("ha", "hb")).cast("long")
        union = F.col("sza") + F.col("szb") - F.col("i")
        n = stage(
            "verify joins            ",
            lambda: cands.join(sa, "da")
            .join(sb, "db")
            .withColumn("i", inter)
            .where(td * F.col("i") >= tn * union)
            .count(),
        )
        print(f"pairs: {n:,}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
