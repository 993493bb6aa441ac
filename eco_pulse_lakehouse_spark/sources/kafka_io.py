"""Kafka source/sink wiring — S1/S9 (SURVEY.md §2.1).

The reference consumes two JSON topics (``fire_risk_processor.py:
49-57``) and produces with json.dumps (``nasa_producer.py:30-35``).
This module is the Spark-native equivalent. No broker exists in the
test image, so these builders are exercised only for plan
construction; the downstream logic is identical for the hermetic
file-source stand-in (streaming/pipeline.py:read_file_stream) —
DataFrame in, DataFrame out.

Requires the spark-sql-kafka package on the classpath at runtime:
``spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1 — subscribe with earliest offsets (fire_risk_processor.py:49-55).
    Value arrives as binary; parse with
    streaming/pipeline.py:parse_json_envelope."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def write_kafka_json(df: DataFrame, brokers: str, topic: str, checkpoint: str):
    """S9 — serialize every row to a JSON value (to_json(struct(*)) ==
    the producers' json.dumps envelope) and stream to a topic."""
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
