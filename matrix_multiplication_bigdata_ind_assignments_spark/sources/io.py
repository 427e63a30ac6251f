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
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read it as raw nanos (legacy conf) and truncate to a
    microsecond timestamp — the same truncation DuckDB applies when it
    reads the nanos column as TIMESTAMP, so both engines see identical
    instants."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - conf always exists on Spark 3.4+
        pass
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return normalize_event_ts(df)


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Convert a raw-nanos ts column (bigint) to a µs-truncated timestamp."""
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df
