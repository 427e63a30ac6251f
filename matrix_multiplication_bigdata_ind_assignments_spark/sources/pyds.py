"""Custom source via the Python DataSource API (Spark 4).

``det_coo`` emits a deterministic n×n COO matrix, v = ((i·37 + j) % 101) / 100,
split into ``parts`` round-robin row groups — each ``InputPartition`` is
pulled independently by an executor, so the source parallelizes like any
file scan.  This is the pattern for wrapping an external row-producing
system (a feed, a key-value scan, a bespoke format) as a first-class
Spark scan, and it replaces the reference's in-process seeded generators
(`Stage 1/Python Implementation/mm_baseline.py:13-15`,
`Stage 2/C Implementation/mm_opt.c:24-37`) with a partitioned, pull-based
form: at 100 TB a generator must never materialize on one node.

Being deterministic (no RNG), the scan is fully DuckDB-oracle-checkable
with a range() cross join.  Note the read path runs in Python workers —
fine for a generator / API adapter, but bulk data stays on the native
parquet/ORC readers.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class DetCooReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 64))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition: InputPartition):
        n, stride = self.n, self.parts
        for i in range(partition.value, n, stride):
            base = i * 37
            for j in range(n):
                yield (i, j, ((base + j) % 101) / 100.0)


class DetCooSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "det_coo"

    def schema(self) -> str:
        return "i long, j long, v double"

    def reader(self, schema) -> DataSourceReader:
        return DetCooReader(self.options)


def register_det_coo(spark: SparkSession) -> None:
    """Idempotently register the det_coo format on this session."""
    spark.dataSource.register(DetCooSource)
