"""Bucketing: the co-located-join scale path (SURVEY.md scale posture).

Writing both join sides bucketed on the key lets Spark sort-merge join
them with NO exchange on either side — at 100 TB this is the difference
between re-shuffling the fact table per query and reading it pre-placed.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from matrix_multiplication_bigdata_ind_assignments_spark.sources import load


@pytest.fixture(scope="module")
def bucketed_join(spark, sf_dir):
    wh = tempfile.mkdtemp(prefix="mmbd_warehouse_")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    orders.write.mode("overwrite").option("path", f"{wh}/b_orders").bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").saveAsTable("b_orders")
    lineitem.write.mode("overwrite").option("path", f"{wh}/b_lineitem").bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").saveAsTable("b_lineitem")
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    # merge hint: at fixture scale Spark would broadcast the small side,
    # which hides the property under test (bucket co-location ⇒ no
    # exchange under a sort-merge join)
    joined = (
        bo.hint("merge").join(bl, bo.o_orderkey == bl.l_orderkey).groupBy("o_orderkey").count()
    )
    yield joined
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_join):
    plan = bucketed_join._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # co-located buckets: neither join side shuffles
    join_part = plan.split("SortMergeJoin")[1]
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan


def test_bucketed_join_correct(spark, sf_dir, bucketed_join):
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    expected = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey")
        .count()
    )
    assert sorted(map(tuple, bucketed_join.collect())) == sorted(map(tuple, expected.collect()))


def test_q_bucketed_join_repeatable_in_session(spark, sf_dir):
    """The registered query overwrites its catalog tables, so a second call
    in the same session (driver re-runs, bench warmup) must not raise."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.bench_results import q_bucketed_join

    first = q_bucketed_join(spark, sf_dir).collect()
    second = q_bucketed_join(spark, sf_dir).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))
