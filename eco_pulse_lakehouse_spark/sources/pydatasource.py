"""Python DataSource (Spark 4 extension surface) — synthetic generator.

The reference fakes ingest with driver-side mock rows
(nasa_producer.py:39-44). The scalable form is a *source*, not a
collect: Spark 4's Python DataSource API
(``pyspark.sql.datasource``) lets the generator run ON THE
EXECUTORS, one ``InputPartition`` per split, so synthetic volume
scales with the cluster instead of the driver. Rows stream back
through Arrow batches.

Determinism contract: every value is a pure function of the global
row id (Knuth unit hash), so output is independent of partition
count/scheduling — the same contract as operators/sampling.py, which
is what makes the DuckDB oracle able to replay it from ``range()``.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

KNUTH = 2654435761
M32 = 1 << 32

SCHEMA = "id BIGINT, bucket INT, u DOUBLE"


class SyntheticReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        # option keys arrive lower-cased
        self.rows_per_partition = int(options.get("rowsperpartition", 1000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):  # noqa: D102 — API hook
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition: InputPartition):
        k = partition.value
        base = k * self.rows_per_partition
        for i in range(base, base + self.rows_per_partition):
            # u is a dyadic rational (num/2^32): sums of <2^21 of them
            # stay exactly representable in double, so aggregates are
            # order-independent without decimal accumulation
            yield (i, k, (i * KNUTH % M32) / M32)


class SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked micro-batch form of the same generator: batch
    ``b`` emits ids ``[b*rows, (b+1)*rows)`` (bucket = batch id) and
    advances the offset, up to ``maxBatches``. Offsets are plain
    dicts checkpointed by the engine, so a restarted query resumes
    exactly where the last one committed — the property
    t12_python_stream_source drains through N separate
    ``availableNow`` runs to prove."""

    def __init__(self, options: dict) -> None:
        self.rows_per_batch = int(options.get("rowsperbatch", 100))
        self.max_batches = int(options.get("maxbatches", 5))

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def _rows(self, b: int) -> list:
        base = b * self.rows_per_batch
        return [
            (i, b, (i * KNUTH % M32) / M32)
            for i in range(base, base + self.rows_per_batch)
        ]

    # both hooks return LIST iterators: the engine's prefetch cache
    # copy.copy()s them (datasource_internal.getCache), which fails
    # on generators
    def read(self, start: dict):
        b = start["batch"]
        if b >= self.max_batches:
            return iter([]), start
        return iter(self._rows(b)), {"batch": b + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        out: list = []
        for b in range(start["batch"], end["batch"]):
            out.extend(self._rows(b))
        return iter(out)


class SyntheticDataSource(DataSource):
    """``spark.read.format("eco_synthetic").option("partitions", 8)
    .option("rowsPerPartition", 1000).load()`` — or ``readStream``
    with ``rowsPerBatch``/``maxBatches`` for the micro-batch form."""

    @classmethod
    def name(cls) -> str:
        return "eco_synthetic"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticReader:
        return SyntheticReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticStreamReader:
        return SyntheticStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticDataSource)
