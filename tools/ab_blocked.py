"""Same-session A/B: the CURRENT blocked-matmul kernel vs the round-3
kernel (VERDICT r6 item 4).

`matmul_blocked_n1024` drifted 1.40 s (r3 min) → 1.77 s (r6 min) across
three rounds of cross-session BENCH captures, each attributed to box
noise.  Cross-session timings on this host are untrustworthy (measured
±30-40% swings on unchanged code), so this tool settles it the only
valid way: both kernels in ONE session, interleaved A/B/A/B (so slow
background drift hits both arms equally), identical operands, same
shuffle-partition pinning as bench.py.

The r3 kernel below is reproduced verbatim from commit 6ebe359
(`matrix.py:180-283` at that revision) with only the function names
prefixed — it emits VALUE-nonzeros (np.nonzero(c_blk)), while the
current kernel computes the STRUCTURAL-touch mask (exact-0.0
cancellations and stored-zero products are emitted like the COO join
and the oracle, r6 correctness fix) at the cost of a presence-GEMM per
tile.  If the A/B gap is real, that mask is the expected cause — a
correctness feature, not a regression.

Usage: python tools/ab_blocked.py [n_reps] [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

_R3_PANEL_BYTES_LIMIT = 64 << 20


def _r3_gemm_cogroup(key, a_pdf: pd.DataFrame, b_pdf: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    if a_pdf.empty or b_pdf.empty:
        return pd.DataFrame({"i": [], "j": [], "v": []})
    a_rows = np.sort(a_pdf["a_i"].unique())
    b_cols = np.sort(b_pdf["b_j"].unique())
    k_lo = int(min(a_pdf["a_j"].min(), b_pdf["b_i"].min()))
    k_hi = int(max(a_pdf["a_j"].max(), b_pdf["b_i"].max()))
    a_blk = np.zeros((len(a_rows), k_hi - k_lo + 1))
    b_blk = np.zeros((k_hi - k_lo + 1, len(b_cols)))
    ai = {r: x for x, r in enumerate(a_rows)}
    bj_ix = {c: x for x, c in enumerate(b_cols)}
    a_blk[a_pdf["a_i"].map(ai).to_numpy(), a_pdf["a_j"].to_numpy() - k_lo] = a_pdf[
        "a_v"
    ].to_numpy()
    b_blk[b_pdf["b_i"].to_numpy() - k_lo, b_pdf["b_j"].map(bj_ix).to_numpy()] = b_pdf[
        "b_v"
    ].to_numpy()
    c_blk = a_blk @ b_blk
    ii, jj = np.nonzero(c_blk)
    return pd.DataFrame({"i": a_rows[ii], "j": b_cols[jj], "v": c_blk[ii, jj]})


def _r3_multiply_blocked(A: DataFrame, B: DataFrame, bs: int) -> DataFrame:
    Ab = A.select(
        (F.col("i") / bs).cast("long").alias("a_bi"),
        (F.col("j") / bs).cast("long").alias("a_bk"),
        F.col("i").alias("a_i"), F.col("j").alias("a_j"), F.col("v").alias("a_v"),
    )
    Bb = B.select(
        (F.col("i") / bs).cast("long").alias("b_bk"),
        (F.col("j") / bs).cast("long").alias("b_bj"),
        F.col("i").alias("b_i"), F.col("j").alias("b_j"), F.col("v").alias("b_v"),
    )
    k_hi = (
        A.select(F.max("j").alias("m"))
        .unionAll(B.select(F.max("i").alias("m")))
        .agg(F.max("m").alias("m"))
        .first()[0]
    )
    panel_bytes = bs * (int(k_hi) + 1) * 8 if k_hi is not None else 0
    if panel_bytes <= _R3_PANEL_BYTES_LIMIT:
        a_keys = Ab.select("a_bi").distinct()
        b_keys = Bb.select("b_bj").distinct()
        a_cells = Ab.crossJoin(F.broadcast(b_keys)).select(
            F.col("a_bi").alias("bi"), F.col("b_bj").alias("bj"), "a_i", "a_j", "a_v"
        )
        b_cells = Bb.crossJoin(F.broadcast(a_keys)).select(
            F.col("a_bi").alias("bi"), F.col("b_bj").alias("bj"), "b_i", "b_j", "b_v"
        )
        final = a_cells.groupBy("bi", "bj").cogroup(
            b_cells.groupBy("bi", "bj")
        ).applyInPandas(_r3_gemm_cogroup, schema="i long, j long, v double")
        return final.select("i", "j", F.round("v", 6).alias("v"))
    a_keys = Ab.select("a_bi", "a_bk").distinct()
    b_keys = Bb.select("b_bk", "b_bj").distinct()
    a_cells = Ab.join(F.broadcast(b_keys), Ab.a_bk == b_keys.b_bk).select(
        F.col("a_bi").alias("bi"), F.col("a_bk").alias("bk"), F.col("b_bj").alias("bj"),
        "a_i", "a_j", "a_v",
    )
    b_cells = Bb.join(F.broadcast(a_keys), Bb.b_bk == a_keys.a_bk).select(
        F.col("a_bi").alias("bi"), F.col("b_bk").alias("bk"), F.col("b_bj").alias("bj"),
        "b_i", "b_j", "b_v",
    )
    partials = a_cells.groupBy("bi", "bk", "bj").cogroup(
        b_cells.groupBy("bi", "bk", "bj")
    ).applyInPandas(_r3_gemm_cogroup, schema="i long, j long, v double")
    return partials.groupBy("i", "j").agg(F.round(F.sum("v"), 6).alias("v"))


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import os

    os.environ.setdefault("MMBD_SHUFFLE_PARTITIONS", "64")
    from bench import mat_from_lineitem
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.matrix import (
        _multiply_blocked as current_kernel,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.session import get_spark

    spark = get_spark("ab-blocked", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")

    A = mat_from_lineitem(spark, sf_dir, 1024).cache()
    B = mat_from_lineitem(spark, sf_dir, 1024, shift=7).cache()
    A.count(), B.count()
    # worker-pool warm-up (same rationale as bench.py)
    A.repartition(32).groupBy("i").applyInPandas(lambda p: p, schema=A.schema).write.format(
        "noop"
    ).mode("overwrite").save()

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    arms = {
        "r3": lambda: run(_r3_multiply_blocked(A, B, 512)),
        "current": lambda: run(current_kernel(A, B, 512)),
    }
    # correctness first: both kernels must agree on every VALUE-nonzero
    # cell (the current kernel additionally emits structural exact-zeros)
    cur = current_kernel(A, B, 512)
    old = _r3_multiply_blocked(A, B, 512)
    diff = (
        cur.where(F.col("v") != 0)
        .alias("c")
        .join(old.alias("o"), ["i", "j"], "full")
        .where(
            F.col("c.v").isNull() | F.col("o.v").isNull() | (F.col("c.v") != F.col("o.v"))
        )
        .count()
    )
    print(f"value-cell disagreements: {diff}")

    # pin shuffle partitions like bench.run_mm
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    times: dict[str, list[float]] = {k: [] for k in arms}
    for k in arms:  # one untimed warm-up per arm
        arms[k]()
    for r in range(reps):
        for k in ("r3", "current") if r % 2 == 0 else ("current", "r3"):
            t0 = time.perf_counter()
            arms[k]()
            times[k].append(time.perf_counter() - t0)
    print("| arm | min (s) | mean (s) | runs |")
    print("|---|---|---|---|")
    for k, ts in times.items():
        print(f"| {k} | {min(ts):.3f} | {sum(ts) / len(ts):.3f} | " + ", ".join(f"{t:.2f}" for t in ts) + " |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
