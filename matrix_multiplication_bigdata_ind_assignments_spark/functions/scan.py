"""Distributed prefix-scan machinery (the two-pass exclusive-cumsum
pattern, generalized from q_sequence_pack — VERDICT r11 item 2).

A global ``sum() OVER (ORDER BY ...)`` or ``row_number() OVER (ORDER BY
...)`` with no partition key collapses the whole input onto ONE reducer
(Spark warns "No Partition Defined for Window operation"): fine on a
reduced rollup at fixture scale, a real single-node sort at 100× part /
user cardinality.  ``two_pass_scan`` is the classic distributed scan
instead:

1. range-partition on the requested TOTAL order (Spark's distributed
   sort machinery) and stamp each row with its partition id;
2. per-partition count/sum totals → driver (one tiny row per
   partition) → exclusive base offsets BROADCAST-JOINED back on pid;
3. local window per partition (keyed by pid — parallel) adds the base.

The offsets return trip is a broadcast join of a tiny DataFrame, not a
``create_map`` literal — a 2·n_partitions-entry literal becomes a
Catalyst-expression liability at 10⁵ partitions, while the broadcast
side stays O(1) in plan size.  Offsets are exact regardless of where
the sampled range boundaries fall, so the partitioner's sampling never
affects the result — but the ORDER must be total (include a key
tie-break) or the within-partition window is nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def two_pass_scan(
    df: DataFrame,
    order: list,
    *,
    sum_col: str | None = None,
    cum_col: str = "cum",
    inclusive: bool = True,
    rn_col: str | None = None,
    n_parts: int | None = None,
    extra_sums: list[tuple[str, str]] | None = None,
    extra_maxes: list[tuple[str, str]] | None = None,
) -> tuple[DataFrame, int, int]:
    """Add a global row number and/or running sums over a total order
    WITHOUT a single-partition window.

    ``order`` is a list of Column sort expressions (``F.asc``/
    ``F.desc``) forming a TOTAL order; ``sum_col`` (long-typed) requests
    a running sum in ``cum_col``; ``extra_sums`` is a list of further
    ``(in_col, out_col)`` running sums sharing the same order and ONE
    shuffle (q_heaps_fit needs two prefix sums over one corpus order);
    ``extra_maxes`` likewise requests running MAXes (long-cast — the
    skyline-frontier primitive); ``inclusive`` applies to all of them;
    ``rn_col`` requests a global
    1-based row number.  Returns ``(df_out, n_rows, total_sum)`` — the
    totals ride the same per-partition collect the offsets need, so
    callers get them with no extra job (total_sum is ``sum_col``'s).
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = spark.sparkContext.defaultParallelism
    sums = ([(sum_col, cum_col)] if sum_col is not None else []) + list(extra_sums or [])
    # materialize the pid stamp once: both consumers (totals + final)
    # must see the SAME partitioning, and localCheckpoint blocks are
    # GC-scoped (swap for checkpoint cadence on a real cluster)
    base = (
        df.repartitionByRange(n_parts, *order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    maxes = list(extra_maxes or [])
    aggs = (
        [F.count(F.lit(1)).alias("__n")]
        + [F.sum(in_col).alias(f"__s{i}") for i, (in_col, _) in enumerate(sums)]
        + [
            F.max(F.col(in_col).cast("long")).alias(f"__m{i}")
            for i, (in_col, _) in enumerate(maxes)
        ]
    )
    per = {r["__pid"]: r for r in base.groupBy("__pid").agg(*aggs).collect()}
    rows, run_n, run_s = [], 0, [0] * len(sums)
    run_m: list = [None] * len(maxes)  # prefix max starts undefined
    for pid in sorted(per):
        rows.append((pid, run_n, *run_s, *run_m))
        run_n += per[pid]["__n"]
        run_s = [run_s[i] + (per[pid][f"__s{i}"] or 0) for i in range(len(sums))]
        run_m = [
            max(v for v in (run_m[i], per[pid][f"__m{i}"]) if v is not None)
            if (run_m[i] is not None or per[pid][f"__m{i}"] is not None)
            else None
            for i in range(len(maxes))
        ]
    schema = (
        "__pid int, __base_n long"
        + "".join(f", __base_s{i} long" for i in range(len(sums)))
        + "".join(f", __base_m{i} long" for i in range(len(maxes)))
    )
    offsets = spark.createDataFrame(
        rows or [(0, 0, *([0] * len(sums)), *([None] * len(maxes)))], schema
    )
    out = base.join(F.broadcast(offsets), "__pid")
    if rn_col is not None:
        w = Window.partitionBy("__pid").orderBy(*order)
        out = out.withColumn(rn_col, F.row_number().over(w) + F.col("__base_n"))
    lo = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    )
    for i, (in_col, out_col) in enumerate(sums):
        out = out.withColumn(
            out_col,
            F.coalesce(F.sum(in_col).over(lo), F.lit(0)) + F.col(f"__base_s{i}"),
        )
    for i, (in_col, out_col) in enumerate(maxes):
        # greatest() skips NULLs, so the first partition (NULL base) and
        # a frame-empty first row (NULL local) degrade exactly like the
        # global window's leading NULLs
        out = out.withColumn(
            out_col,
            F.greatest(
                F.max(F.col(in_col).cast("long")).over(lo), F.col(f"__base_m{i}")
            ),
        )
    return (
        out.drop(
            "__pid",
            "__base_n",
            *[f"__base_s{i}" for i in range(len(sums))],
            *[f"__base_m{i}" for i in range(len(maxes))],
        ),
        run_n,
        run_s[0] if sums else 0,
    )


def ntile_of_rank(rn_col: str, n_rows: int, buckets: int) -> str:
    """SQL-standard ``ntile(buckets)`` as a closed form over a global
    1-based row number: the first ``n mod b`` buckets take ``n div b +
    1`` rows, the rest ``n div b`` — NOT the evenly-spread
    ``floor((rn-1)·b/n)+1`` approximation, which puts the remainder in
    the wrong buckets (n=7, b=5: standard is 2,2,1,1,1; the spread form
    gives rn=4 bucket 3 instead of 2).  ``n_rows`` is driver-side (the
    two_pass_scan totals), so the split point is a constant in the
    expression."""
    q, r = divmod(n_rows, buckets)
    if q == 0:  # fewer rows than buckets: row i is its own bucket i
        return f"CAST({rn_col} AS INTEGER)"
    return (
        f"CAST(CASE WHEN {rn_col} <= {(q + 1) * r}"
        f" THEN 1 + ({rn_col} - 1) DIV {q + 1}"
        f" ELSE {r + 1} + ({rn_col} - 1 - {(q + 1) * r}) DIV {q} END"
        f" AS INTEGER)"
    )
