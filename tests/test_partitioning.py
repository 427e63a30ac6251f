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
