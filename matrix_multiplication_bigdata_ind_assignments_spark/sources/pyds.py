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


try:  # Spark 4 streaming extension point for Python data sources
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    _HAVE_SIMPLE_STREAM = True
except ImportError:  # pragma: no cover
    _HAVE_SIMPLE_STREAM = False


if _HAVE_SIMPLE_STREAM:

    class DetCooStreamReader(SimpleDataSourceStreamReader):
        """Micro-batched twin of DetCooReader: batch b carries row-block
        [b·n/batches, (b+1)·n/batches) of the same deterministic matrix;
        batches past the end are empty (the offset still advances, as a
        real feed would idle).  Offsets are plain dicts; readBetweenOffsets
        replays any committed range deterministically — the exactly-once
        replay contract."""

        def __init__(self, options: dict):
            self.n = int(options.get("n", 64))
            self.batches = int(options.get("batches", 4))

        def initialOffset(self) -> dict:
            return {"batch": 0}

        def _rows(self, b: int):
            rows_per = self.n // self.batches
            if b >= self.batches:
                return
            for i in range(b * rows_per, (b + 1) * rows_per):
                base = i * 37
                for j in range(self.n):
                    yield (i, j, ((base + j) % 101) / 100.0)

        def read(self, start: dict):
            return iter(list(self._rows(start["batch"]))), {"batch": start["batch"] + 1}

        def readBetweenOffsets(self, start: dict, end: dict):
            out = []
            for b in range(start["batch"], end["batch"]):
                out.extend(self._rows(b))
            return iter(out)


def _simple_stream_reader(self, schema):
    return DetCooStreamReader(self.options)


if _HAVE_SIMPLE_STREAM:
    DetCooSource.simpleStreamReader = _simple_stream_reader
