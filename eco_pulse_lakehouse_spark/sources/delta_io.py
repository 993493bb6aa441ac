"""Delta Lake table IO — S3/S4/S5/S6 (SURVEY.md §2.1), gated.

The reference persists every layer as Delta (``fire_risk_processor
.py:73-86``, ``gold_batch_job.py:83-87``, delta-rs read at
``app.py:55``). delta-spark is not installed in this image, so the
functions below transparently fall back to parquet — same call
sites, same semantics minus ACID/log features. On a real cluster
with delta-spark on the classpath the Delta path activates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - environment dependent
    import delta  # noqa: F401

    HAS_DELTA = True
except ImportError:
    HAS_DELTA = False

_FMT = "delta" if HAS_DELTA else "parquet"


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """S4/S6 — snapshot scan of a persisted table."""
    return spark.read.format(_FMT).load(path)


def overwrite_table(df: DataFrame, path: str) -> None:
    """S5 — full overwrite with schema replacement
    (gold_batch_job.py:83-87). NOTE the reference counts *then*
    writes without caching, executing its DAG twice (SURVEY.md §3.2);
    callers here write once and read counts from the sink."""
    w = df.write.format(_FMT).mode("overwrite")
    if HAS_DELTA:
        w = w.option("overwriteSchema", "true")
    w.save(path)


def append_stream(df: DataFrame, path: str, checkpoint: str):
    """S3 — checkpointed streaming append sink
    (fire_risk_processor.py:73-86)."""
    return (
        df.writeStream.format(_FMT)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start(path)
    )
