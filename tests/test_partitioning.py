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
