"""Shuffle-byte envelope guards (VERDICT r6 item 1, widened r8 item 2).

Wall time at local[32] cannot distinguish a plan regression from box
noise (±30% swings on unchanged code were measured in r6), but
shuffle bytes are a pure function of the physical plan and the
immutable fixture — measured here to be bit-identical across repeats —
so a byte envelope catches the regression class that matters at 100 TB
(a plan change that doubles exchange volume) deterministically.

Coverage = every headline query writing ≥10 MB at the bench SF
(VERDICT r7 item 2 names them): the three biggest matmul shapes are
bench-only parameterizations, so they get dedicated thunks built from
the SAME operand recipe bench.py uses (imported, not copied) at this
suite's sf0.001 fixture.

Envelopes were recorded at sf0.001 on pyspark 4.1.2 with the session
defaults (AQE on, 32 shuffle partitions).  The band is deliberately
loose (0.4×–1.6×) so partition-count or minor version drift doesn't
trip it, while a doubled exchange does.  On a Spark build where the
UI-off AppStatusStore accessors have changed shape, the metrics module
raises ShuffleMetricsUnavailable and these tests skip (they are a perf
guard, not a correctness gate).
"""

import pytest

from matrix_multiplication_bigdata_ind_assignments_spark import registry
from matrix_multiplication_bigdata_ind_assignments_spark.functions.metrics import (
    ShuffleMetricsUnavailable,
    measure_shuffle,
    shuffle_delta,
    shuffle_snapshot,
)

# query → recorded steady-state shuffle_write_bytes at sf0.001 (read ==
# write for every completed exchange; spill is zero at this scale).
# Queries with memoized stat probes (minhash's hot-bucket probe) shuffle
# MORE on first touch — the test warms once before measuring, matching
# how the bench measures.
_ENVELOPES = {
    "q_bloom_semi_join": 11_182,
    "q_corpus_clean_e2e": 14_663,
    "q_matmul_blocked": 205_558,
    # the pagerank loop's 10 iterations: the r6 per-round edge
    # re-exchange regression (150 MB at sf0.1) was caught by exactly
    # this number — keep it pinned
    "q_pagerank": 162_816,
    "q_dedup_minhash": 89_959,
    # r8 widening — the remaining ≥10 MB-at-bench-SF writers:
    "q_pagerank_directed": 116_145,
    # r11: first-untouched-block emission deleted the pair distinct and
    # its exchange — the remaining bytes are the fingerprint agg + band
    # index only, identical for both layouts (387,966 / 387,263 before)
    "q_dedup_simhash_pairs": 91_978,
    "q_dedup_simhash_c6": 91_978,
    "q_dedup_ngram_jaccard": 288_396,
    # r8: 37.7 MB at sf0.1 (the co-supply pair generation dominates) —
    # the one new-this-round query over the ≥10 MB-at-bench-SF bar
    "q_triangle_count": 28_166,
    # r9: the two new co-supply-graph consumers, both ≥10 MB at bench SF
    # (37.7 / 39.1 MB at sf0.1 — again dominated by the shared pair
    # generation; the peel/propagation loops themselves are |V|-scaled)
    "q_kcore": 26_724,
    "q_label_prop": 30_378,
}

# bench-only matmul shapes (operands derived from lineitem exactly as
# bench.py does — same plan, sf0.001-sized data)
_MATMUL_ENVELOPES = {
    "matmul_join_n256": 1_764_409,
    # identical bytes to the join form at this scale: AQE broadcasts the
    # tiny side either way, so both plans' exchanges reduce to the same
    # partial-product aggregation — the envelope still pins that shared
    # agg volume
    "matmul_broadcast_n256": 1_764_409,
    "spmm_sparse_n2048_d05": 53_643,
    "matmul_blocked_n4096_3d": 589_686,
}


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _measure_or_skip(spark, run):
    try:
        return measure_shuffle(spark, run)
    except ShuffleMetricsUnavailable as e:
        pytest.skip(f"shuffle metrics unavailable on this Spark build: {e}")


def _assert_envelope(d, expected):
    lo, hi = 0.4 * expected, 1.6 * expected
    assert lo <= d["shuffle_write_bytes"] <= hi, d
    # a completed run reads back everything it wrote
    assert d["shuffle_read_bytes"] >= 0.9 * d["shuffle_write_bytes"], d
    # nothing at this scale may spill
    assert d["spill_disk_bytes"] == 0, d


@pytest.mark.parametrize("name", sorted(_ENVELOPES))
def test_shuffle_envelope(spark, sf_dir, name):
    q = registry.queries()[name]

    def run():
        _noop(q(spark, sf_dir))

    run()  # warm: stat-probe memos populated, steady-state plan measured
    _assert_envelope(_measure_or_skip(spark, run), _ENVELOPES[name])


@pytest.fixture(scope="module")
def matmul_thunks(spark, sf_dir):
    """The three bench matmul shapes, operands cached outside any
    measurement window (bench.py's recipe, imported)."""
    from bench import mat_from_lineitem
    from matrix_multiplication_bigdata_ind_assignments_spark.operators import matrix as M

    ops = {
        "A256": mat_from_lineitem(spark, sf_dir, 256),
        "B256": mat_from_lineitem(spark, sf_dir, 256, shift=7),
        "A2048": mat_from_lineitem(spark, sf_dir, 2048).where("(i * 2048 + j) % 20 = 0"),
        "B2048": mat_from_lineitem(spark, sf_dir, 2048, shift=7),
        "A4096": mat_from_lineitem(spark, sf_dir, 4096),
        "B4096": mat_from_lineitem(spark, sf_dir, 4096, shift=7),
    }
    for df in ops.values():
        df.cache().count()
    yield {
        "matmul_join_n256": lambda: _noop(
            M.multiply(ops["A256"], ops["B256"], strategy="join")
        ),
        "matmul_broadcast_n256": lambda: _noop(
            M.multiply(ops["A256"], ops["B256"], strategy="broadcast")
        ),
        "spmm_sparse_n2048_d05": lambda: _noop(
            M.multiply(ops["A2048"], ops["B2048"], strategy="join")
        ),
        "matmul_blocked_n4096_3d": lambda: _noop(
            M.multiply(
                ops["A4096"],
                ops["B4096"],
                strategy="blocked",
                block_size=2048,
                panel_bytes=32 << 20,
            )
        ),
    }
    for df in ops.values():
        df.unpersist()


@pytest.mark.parametrize("name", sorted(_MATMUL_ENVELOPES))
def test_shuffle_envelope_matmul(spark, matmul_thunks, name):
    run = matmul_thunks[name]
    run()  # warm
    _assert_envelope(_measure_or_skip(spark, run), _MATMUL_ENVELOPES[name])


def test_snapshot_monotone_and_delta_clamped(spark):
    """Snapshots are cumulative; deltas clamp at zero so pre-window stage
    eviction can't produce negative charges.  Also pins the O(window)
    contract: a snapshot taken `since` the current max stage id charges
    only window-new stages."""
    from matrix_multiplication_bigdata_ind_assignments_spark.functions.metrics import (
        settled_snapshot,
    )

    try:
        s0 = settled_snapshot(spark)
    except ShuffleMetricsUnavailable as e:
        pytest.skip(f"shuffle metrics unavailable on this Spark build: {e}")
    import pyspark.sql.functions as F

    df = spark.range(10_000).withColumn("k", F.col("id") % 7).groupBy("k").count()
    df.write.format("noop").mode("overwrite").save()
    # settled on both edges (r8 review: raw snapshots race the async
    # AppStatusListener bus — in-flight stage events could land between
    # the s1 and win reads and flake the exact-equality asserts below)
    s1 = settled_snapshot(spark)
    d = shuffle_delta(s0, s1)
    assert d["shuffle_write_bytes"] > 0
    assert all(v >= 0 for v in d.values())
    assert all(s1[k] >= s0[k] for k in s0)
    # windowed form: since the pre-window max id, only the new stages count
    win = shuffle_snapshot(spark, since_stage_id=s0["max_stage_id"])
    assert win["shuffle_write_bytes"] == d["shuffle_write_bytes"]
    assert win["max_stage_id"] == s1["max_stage_id"]
