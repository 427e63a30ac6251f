"""Timestamp-type regression tests (VERDICT.md r1 item 1/8).

The events fixture carries parquet TIMESTAMP(NANOS).  Depending on the
Spark version and session confs it can surface as bigint raw nanos
(legacy ``nanosAsLong`` readers) or as ``timestamp_ntz`` (Spark 4.x
default) — round 1 shipped with only the bigint branch handled, which
broke q_range_join, q_asof_join, and every streaming query under the
driver's vanilla session.  These tests pin the contract: ``load`` always
yields a µs-precision TIMESTAMP ``ts``, from any representation, with no
reliance on session confs the driver may not set.
"""

import datetime

from pyspark.sql import functions as F

from matrix_multiplication_bigdata_ind_assignments_spark.sources import load
from matrix_multiplication_bigdata_ind_assignments_spark.sources.io import normalize_event_ts

from conftest import SF_DIR


def test_loaded_events_ts_is_timestamp(spark):
    dt = dict(load(spark, SF_DIR, "events").dtypes)
    assert dt["ts"] == "timestamp", dt["ts"]


def test_normalize_from_ntz(spark):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 2, 3, 4, 5, 123456))], "event_id long, ts timestamp_ntz"
    )
    out = normalize_event_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    # UTC session pinned → the wall-clock instant is preserved
    got = out.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s")).first().s
    assert got == "2024-01-02 03:04:05.123456"


def test_normalize_from_raw_nanos(spark):
    ns = 1704164645123456789  # 2024-01-02 03:04:05.123456789 UTC
    df = spark.createDataFrame([(1, ns)], "event_id long, ts bigint")
    out = normalize_event_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    got = out.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s")).first().s
    # µs truncation, same as DuckDB reading nanos as TIMESTAMP
    assert got == "2024-01-02 03:04:05.123456"


def test_normalize_passthrough_timestamp(spark):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 2, 3, 4, 5))], "event_id long, ts timestamp"
    )
    assert dict(normalize_event_ts(df).dtypes)["ts"] == "timestamp"


def test_unix_micros_works_on_loaded_events(spark):
    """The exact expression that ERR'd in CORRECTNESS_r01 for
    q_range_join/q_asof_join."""
    e = load(spark, SF_DIR, "events")
    n = e.select(F.unix_micros("ts").alias("us")).where(F.col("us").isNotNull()).count()
    assert n > 0


def test_watermark_accepts_loaded_events(spark):
    """withWatermark rejected TIMESTAMP_NTZ event time in round 1; the
    normalized ts must be watermarkable."""
    e = load(spark, SF_DIR, "events")
    # batch DataFrames accept withWatermark for analysis purposes; the
    # streaming path shares normalize_event_ts with this loader
    agg = (
        e.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert agg.count() > 0
