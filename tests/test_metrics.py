"""Shuffle-byte envelope guards (VERDICT r6 item 1).

Wall time at local[32] cannot distinguish a plan regression from box
noise (±30% swings on unchanged code were measured in r6), but
shuffle bytes are a pure function of the physical plan and the
immutable fixture — measured here to be bit-identical across repeats —
so a byte envelope catches the regression class that matters at 100 TB
(a plan change that doubles exchange volume) deterministically.

Envelopes were recorded at sf0.001 on pyspark 4.1.2 with the session
defaults (AQE on, 32 shuffle partitions).  The band is deliberately
loose (0.4×–1.6×) so partition-count or minor version drift doesn't
trip it, while a doubled exchange does.
"""

import pytest

from matrix_multiplication_bigdata_ind_assignments_spark import registry
from matrix_multiplication_bigdata_ind_assignments_spark.functions.metrics import (
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
}


@pytest.mark.parametrize("name", sorted(_ENVELOPES))
def test_shuffle_envelope(spark, sf_dir, name):
    q = registry.queries()[name]

    def run():
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()

    run()  # warm: stat-probe memos populated, steady-state plan measured
    d = measure_shuffle(spark, run)
    lo, hi = 0.4 * _ENVELOPES[name], 1.6 * _ENVELOPES[name]
    assert lo <= d["shuffle_write_bytes"] <= hi, d
    # a completed run reads back everything it wrote
    assert d["shuffle_read_bytes"] >= 0.9 * d["shuffle_write_bytes"], d
    # nothing at this scale may spill
    assert d["spill_disk_bytes"] == 0, d


def test_snapshot_monotone_and_delta_clamped(spark):
    """Snapshots are cumulative; deltas clamp at zero so pre-window stage
    eviction can't produce negative charges."""
    s0 = shuffle_snapshot(spark)
    import pyspark.sql.functions as F

    df = spark.range(10_000).withColumn("k", F.col("id") % 7).groupBy("k").count()
    df.write.format("noop").mode("overwrite").save()
    s1 = shuffle_snapshot(spark)
    d = shuffle_delta(s0, s1)
    assert d["shuffle_write_bytes"] > 0
    assert all(v >= 0 for v in d.values())
    assert all(s1[k] >= s0[k] for k in s0)
