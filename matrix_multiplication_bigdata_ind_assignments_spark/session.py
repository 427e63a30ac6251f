"""SparkSession factory.

Scale posture (SURVEY.md §7): AQE on (runtime re-plan, skew-join splitting,
dynamic coalescing of shuffle partitions), Arrow on (vectorized
pandas_udf/applyInPandas transfer), shuffle partitions sized for the local
harness but overridable for a real cluster via env.

The driver passes its own SparkSession into queries; this factory is for
tests and ``bench.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mmbd-spark",
    cpus: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle_partitions = os.environ.get("MMBD_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("MMBD_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # runtime bloom-filter semi-join reduction: a shuffle join whose
        # build side filters well gets a bloom filter pushed into the
        # probe-side scan — the engine-native form of the "bloom prefilter
        # before the exact anti join" dedup pattern, on by default here so
        # big joins (incremental dedup vs history) shuffle fewer rows
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
