"""Table catalog for the driver's synthetic star schema.

Loads the TPC-H-ish parquet tables described in TESTDATA.md and
registers them as temp views, so operators can be phrased either
via the DataFrame API or ``spark.sql``.

At 100 TB each ``spark.read.parquet`` here becomes a partitioned
(e.g. by date) table scan; nothing else changes — Catalyst handles
partition pruning, predicate pushdown, and column pruning from the
declarative plans built on top of these DataFrames.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # The driver owns the session: pin UTC so timestamp semantics match
    # the DuckDB oracle regardless of host timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ``ts`` as TIMESTAMP(NANOS), which Spark's
    vectorized parquet reader rejects (PARQUET_TYPE_ILLEGAL). Read the
    nanos as a raw long (legacy conf) and truncate to microseconds —
    exactly what DuckDB does when it narrows ns → its us TIMESTAMP.
    Set defensively at read time because the driver owns the session.
    ``div`` is integer division on longs: ns epochs exceed 2^53 and
    would lose precision through a double.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view of the same name."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
