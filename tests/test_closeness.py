"""Landmark harmonic closeness (operators/closeness.py)."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from matrix_multiplication_bigdata_ind_assignments_spark.operators.closeness import (  # noqa: E402
    landmark_distances,
    q_closeness_landmarks,
)


def _harmonic(spark, edges):
    dists = landmark_distances(edges)
    return {
        r["node"]: r["h"]
        for r in dists.where(F.col("dist") > 0)
        .groupBy("node")
        .agg(F.round(F.sum(F.lit(1.0) / F.col("dist")), 12).alias("h"))
        .collect()
    }


def test_single_landmark_path_graph(spark):
    """Chain 20—1—4—3 with landmark 20 (the only node ≡ 0 mod 20):
    H(1)=1, H(4)=1/2, H(3)=1/3; the landmark itself gets no self term."""
    edges = spark.createDataFrame([(20, 1), (1, 4), (4, 3)], "src long, dst long")
    h = _harmonic(spark, edges)
    assert h[1] == 1.0 and h[4] == 0.5
    assert abs(h[3] - 1 / 3) < 1e-9
    assert 20 not in h  # dist>0 filter removes the self pair


def test_two_landmarks_sum(spark):
    """Chain 20—1—40: node 1 is adjacent to both landmarks (H=2); each
    landmark sees the other at distance 2 (H=1/2)."""
    edges = spark.createDataFrame([(20, 1), (1, 40)], "src long, dst long")
    h = _harmonic(spark, edges)
    assert h[1] == 2.0
    assert h[20] == h[40] == 0.5


def test_unreachable_component_emits_zero(spark, tmp_path):
    """A component with no landmark contributes harmonic 0.0 rows, not
    missing rows — exercised through the registered query by writing a
    fixture whose trade graph has a landmark-free island."""
    # suppliers 10 (node 20, landmark) and 3 (node 6); customers 1 (node 3)
    # and 7 (node 15).  Orders: landmark island {20,3}; island {6,15} has
    # no supplier ≡ 0 (mod 10) → harmonic 0.0 for both its nodes.
    li = spark.createDataFrame(
        [(1, 10), (2, 3)], "l_orderkey long, l_suppkey long"
    )
    orders = spark.createDataFrame(
        [(1, 1), (2, 7)], "o_orderkey long, o_custkey long"
    )
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    orders.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    rows = {(r["kind"], r["key"]): r["harmonic"] for r in q_closeness_landmarks(spark, str(tmp_path)).collect()}
    assert rows[("supplier", 10)] == 0.0  # the sole landmark: no other landmark to see
    assert rows[("customer", 1)] == 1.0
    assert rows[("supplier", 3)] == 0.0
    assert rows[("customer", 7)] == 0.0


def test_extra_rounds_invariant(spark, sf_dir):
    """6 rounds already reaches fixpoint on the trade graph: doubling
    the unroll must be bit-identical (the R+1 certificate's local
    twin)."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.graph import trade_edges

    edges = trade_edges(spark, sf_dir)
    a = sorted(tuple(r) for r in landmark_distances(edges, rounds=6).collect())
    b = sorted(tuple(r) for r in landmark_distances(edges, rounds=12).collect())
    assert a == b


def test_bitmask_multiword_crosses_64_landmarks(spark):
    """r12 bitmask internals: 65 landmarks force a second mask word
    (ix 64 → wi=1, bit=0) and use bit 63 of word 0 — the word-boundary
    paths of the packed level-set state.  Hub-and-spoke closed form:
    hub node 1 is adjacent to all 65 landmarks (H(1)=65); every landmark
    sees the other 64 landmarks at distance 2 (the hub is NOT a
    landmark, so it contributes nothing): H(lm)=64/2=32."""
    lms = [20 * (i + 1) for i in range(65)]
    edges = spark.createDataFrame([(lm, 1) for lm in lms], "src long, dst long")
    dists = landmark_distances(edges)
    assert dists.where(F.col("dist") > 2).count() == 0
    h = _harmonic(spark, edges)
    assert h[1] == 65.0
    assert all(h[lm] == 32.0 for lm in lms)
    # every (node, lm) pair is distinct exactly once — the exploded
    # union must not re-emit a settled pair in a later round
    pairs = landmark_distances(edges).groupBy("node", "lm").count()
    assert pairs.where(F.col("count") > 1).count() == 0


def test_copartition_arm_bit_identical(spark, sf_dir):
    """The copartition fallback (the arm the growth probe's 10x graphs
    need — the pair frontier outgrows the broadcast build) must produce
    the identical distance table: integer monotone relaxation is
    join-strategy-invariant."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.graph import trade_edges

    edges = trade_edges(spark, sf_dir)
    a = sorted(tuple(r) for r in landmark_distances(edges).collect())
    b = sorted(
        tuple(r)
        for r in landmark_distances(edges, join_strategy="copartition").collect()
    )
    assert a == b
