"""Partitioned-layout write + partition pruning: the other half of the
storage-layout story (tests/test_bucketing.py covers bucket co-location).
A filter on the partition column must prune directories at planning time
(PartitionFilters), not scan-and-discard."""

import tempfile

import pytest
from pyspark.sql import functions as F

from matrix_multiplication_bigdata_ind_assignments_spark.sources import load


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="mmbd_part_")
    load(spark, sf_dir, "events").write.mode("overwrite").partitionBy("event_type").parquet(out)
    return out


def test_partition_pruning(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).where(F.col("event_type") == "purchase")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    # pruning happens in PartitionFilters, not as a post-scan data filter
    assert "(event_type" in plan.split("PartitionFilters")[1].split("PushedFilters")[0]


def test_partitioned_roundtrip_values(spark, sf_dir, partitioned_events):
    src = load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    back = spark.read.parquet(partitioned_events).where(F.col("event_type") == "purchase")
    assert back.count() == src.count()
    assert back.agg(F.sum("event_id")).collect() == src.agg(F.sum("event_id")).collect()


def test_zorder_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordered files must each cover a compact region of BOTH key
    dimensions: the mean per-file key-span fraction stays well under an
    unclustered (hash-repartitioned) write's ~full-span files."""
    from pyspark.sql import functions as F

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.bench_results import _zvalue
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")

    def mean_span_fraction(path) -> tuple[float, float]:
        back = spark.read.parquet(str(path)).withColumn("f", F.input_file_name())
        spans = back.groupBy("f").agg(
            (F.max("l_orderkey") - F.min("l_orderkey")).alias("so"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("sp"),
        )
        tot = l.agg(
            (F.max("l_orderkey") - F.min("l_orderkey")).alias("to"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("tp"),
        ).first()
        r = spans.agg(F.avg("so"), F.avg("sp")).first()
        return r[0] / tot["to"], r[1] / tot["tp"]

    # 16 files = 4 z-levels = 2 splits per dimension (a symmetric 4×4 grid
    # of boxes; 8 files would split one dim twice and the other once)
    zdir, hdir = tmp_path / "z", tmp_path / "h"
    (
        l.withColumn("zval", _zvalue(l, "l_orderkey", "l_partkey"))
        .repartitionByRange(16, "zval").sortWithinPartitions("zval").drop("zval")
        .write.parquet(str(zdir))
    )
    l.repartition(16).write.parquet(str(hdir))

    zo, zp = mean_span_fraction(zdir)
    ho, hp = mean_span_fraction(hdir)
    # hash layout: every file spans ~the whole plane in both dims
    assert ho > 0.9 and hp > 0.9
    # z-order: average file covers a small box in BOTH dims
    assert zo < 0.5 and zp < 0.5, (zo, zp)


def test_salting_planner_stat_driven(spark, sf_dir):
    """salted_join_auto: sampled top-key share → salt only past the
    threshold; identical results on both paths (VERDICT r5 item 7)."""
    from pyspark.sql import functions as F

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.relational import (
        salted_join_auto,
        top_key_share,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.plans import choose_join_salting
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    assert choose_join_salting(0.9) and choose_join_salting(0.2)
    assert not choose_join_salting(0.19) and not choose_join_salting(0.01)

    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")

    # uniform keys: the sampled share is tiny → plain shuffle join
    uni_stats = {}
    uniform = salted_join_auto(
        li.select("l_partkey", "l_quantity"), part, "l_partkey", "p_partkey", stats=uni_stats
    )
    assert uni_stats["top_key_share"] < 0.2 and uni_stats["salted"] is False

    # synthetic mega-key (90% of rows on partkey 1) → salted
    hot = li.select(
        F.when(F.col("l_orderkey") % 10 < 9, F.lit(1)).otherwise(F.col("l_partkey")).alias("k"),
        "l_quantity",
    )
    hot_stats = {}
    salted = salted_join_auto(hot, part, "k", "p_partkey", n_salts=8, stats=hot_stats)
    assert hot_stats["top_key_share"] >= 0.2 and hot_stats["salted"] is True
    assert "mmbd_salt" not in salted.columns

    # the salt is a join-key refinement, not a filter: row-level equality
    plain = hot.join(part, hot["k"] == part["p_partkey"])
    agg = lambda df: sorted(
        tuple(r)
        for r in df.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
        .collect()
    )
    assert agg(salted) == agg(plain)
