"""Table loaders for the driver's parquet fixture tables (TESTDATA.md).

Plain ``spark.read.parquet`` — column pruning and predicate pushdown are
Catalyst's job; nothing is cached or collected here so plans stay fully
pushdown-able (`.explain` shows PushedFilters/ReadSchema reaching the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    try:
        # all date/time bucketing and the DuckDB oracles assume naive-UTC
        # wall clocks; pin the session so a non-UTC host can't shift them
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # pragma: no cover
        pass
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS); depending on the Spark
    version it surfaces as either bigint raw nanos (with the legacy
    ``nanosAsLong`` conf, Spark <=3.x) or as ``timestamp_ntz`` truncated
    to µs (Spark 4.x default). Normalize both to a plain µs TIMESTAMP so
    every downstream consumer (unix_micros, withWatermark, window()) sees
    one type. The session time zone is pinned UTC in ``load``, so the
    NTZ→TIMESTAMP cast preserves the wall-clock instant and matches what
    DuckDB computes reading the same column as TIMESTAMP."""
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return normalize_event_ts(df)


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the ``ts`` column to a µs-precision TIMESTAMP (UTC session).

    Handles every representation the fixture can load as:
    - bigint raw nanos (legacy nanosAsLong readers) → timestamp_micros
    - timestamp_ntz (Spark 4.x nanos-parquet default) → cast to timestamp
    - timestamp → already correct
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
