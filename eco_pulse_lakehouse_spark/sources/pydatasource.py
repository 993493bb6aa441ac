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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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


class SyntheticDataSource(DataSource):
    """``spark.read.format("eco_synthetic").option("partitions", 8)
    .option("rowsPerPartition", 1000).load()``"""

    @classmethod
    def name(cls) -> str:
        return "eco_synthetic"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticReader:
        return SyntheticReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticDataSource)
