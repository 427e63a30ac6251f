"""Heavy hitters via mergeable Misra–Gries summaries + exact verify
(SURVEY.md §2.3 'sketch/profiling' class; Misra & Gries 1982, and the
mergeable-summaries merge rule of Agarwal et al., PODS'12).

Why not just groupBy+HAVING?  At 100 TB the token/key stream has
billions of DISTINCT keys and a full `groupBy(key)` shuffles every one
of them to find the handful above threshold.  The sketch path bounds
the shuffle to candidates:

1. ONE `mapInPandas` pass keeps an m-counter Misra–Gries summary per
   partition (vectorized per Arrow batch via value_counts, then one
   bounded decrement step; memory O(m) regardless of partition size)
   and emits the partition's exact row total alongside its candidate
   keys — so the stream total needs no extra corpus scan (two scans
   end-to-end: sketch, verify);
2. the union of per-partition summaries (≤ m·P keys, localCheckpointed
   — it is re-read for candidates AND totals) is broadcast back and the
   exact pass counts ONLY rows whose key is a candidate — the map side
   drops the long tail before the shuffle, so the exchange carries
   O(m·P) partial counts instead of O(|distinct|);
3. the threshold filter count > n DIV k keeps exactly the true heavy
   hitters (n re-assembled from the per-partition totals as a 1-row
   broadcast crossJoin — in-plan, no collect).

LOSSLESS by the MG guarantee — with HEADROOM: the summary keeps m = 4k
counters while the threshold divides by k.  An m-counter summary
contains every item with partition frequency > n_p/(m+1); a key absent
from ALL summaries therefore has global frequency ≤ Σ_p n_p/(m+1) =
n/(m+1), which is below the n DIV k threshold whenever
n ≥ k(m+1)/(m+1−k)  (= 134 rows at k=100, m=400; with m = k exactly,
the bound would demand n ≥ k(k+1), which the smallest fixture misses).
Below even that, partitions with ≤ m distinct keys never decrement at
all — the summary is exact and complete.  So every true heavy hitter is
a candidate, and the exact verify pass removes the false positives.
The oracle is the UNSKETCHED full groupBy+HAVING, so losslessness is
re-proved on every gate run (same exact-oracle-over-approx-path
contract as q_dedup_jaccard_prefix).  Adversarial-partitioning +
synthetic-skew cover in tests/test_profiling.py.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load

_HH_K = 100  # threshold divisor: heavy ⇔ freq > n DIV k
_HH_COUNTERS = 4 * _HH_K  # summary capacity m — headroom makes the sketch lossless


def _mg_summaries(m: int):
    """mapInPandas kernel: per-partition Misra–Gries summary with ``m``
    counters, merged batch-by-batch (each Arrow batch's exact
    value_counts is itself an MG summary with zero error; merging two
    summaries = add counts, then subtract the (m+1)-th largest count
    from all and drop ≤0 — the PODS'12 mergeable-summaries rule, error
    additive and ≤ n_p/(m+1) total)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        counts: pd.Series | None = None
        total = 0
        for pdf in batches:
            total += len(pdf)
            vc = pdf["w"].value_counts()
            counts = vc if counts is None else counts.add(vc, fill_value=0)
            if len(counts) > m:
                pivot = counts.nlargest(m + 1).iloc[-1]
                counts = counts - pivot
                counts = counts[counts > 0]
        keys = [] if counts is None else list(counts.index.astype(str))
        # candidates carry pc=NULL; one w=NULL row carries the partition's
        # exact row count, so the stream total needs no second corpus scan
        yield pd.DataFrame({"w": keys + [None], "pc": [None] * len(keys) + [total]})

    return kernel


def heavy_hitters(
    spark: SparkSession, keys: DataFrame, k: int = _HH_K, counters: int = _HH_COUNTERS
) -> DataFrame:
    """Keys with frequency > n DIV k over a one-column frame ``(w)``.

    Plan: ONE MG pass (O(counters) memory/partition, ≤ counters+1 rows
    out each: candidate keys + the partition's exact row total) →
    broadcast the candidate set into a semi filter on the re-scanned
    stream → exact hash agg over the surviving rows only → threshold
    against the total re-assembled from the per-partition counts (1-row
    broadcast crossJoin, no collect).  The summary frame is
    localCheckpointed — it is tiny (≤ (counters+1)·P rows) and read
    twice (candidates + totals); without the cut both limbs would
    re-run the corpus sketch pass.  Lossless when
    n ≥ k(counters+1)/(counters+1−k) — see module docstring."""
    if counters <= k:
        raise ValueError(f"counters ({counters}) must exceed the threshold divisor k ({k})")
    summaries = keys.mapInPandas(
        _mg_summaries(counters), schema="w string, pc long"
    ).localCheckpoint(eager=True)
    cands = summaries.where(F.col("w").isNotNull()).select("w").distinct()
    tot = summaries.agg(F.sum("pc").alias("n"))
    return (
        keys.join(F.broadcast(cands), "w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("cnt") > F.expr(f"n DIV {k}"))
        .select(F.col("w").alias("word"), "cnt")
    )


_HH_ORACLE = f"""
WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
tt AS (SELECT w FROM t WHERE w <> ''),
n AS (SELECT count(*) AS n FROM tt)
SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
FROM tt GROUP BY w
HAVING count(*) > (SELECT n FROM n) // {_HH_K}
"""


@register("q_heavy_hitters", oracle=_HH_ORACLE)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens with corpus frequency > n/100 over the documents table —
    Misra–Gries candidate pass + exact verify; the oracle is the
    unsketched full groupBy+HAVING, so the sketch path's losslessness
    is re-checked on every gate run."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("w")).where(F.col("w") != "")
    return heavy_hitters(spark, toks, _HH_K)
