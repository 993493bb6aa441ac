"""Custom stateful streaming: applyInPandasWithState running totals
across micro-batches, and the foreachBatch MERGE sink (streaming/
stateful.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.catalog import load_table
from eco_pulse_lakehouse_spark.streaming import pipeline as sp
from eco_pulse_lakehouse_spark.streaming.stateful import (
    foreach_batch_upsert,
    reassemble_stream,
    running_totals_stream,
)

SF = "/root/testdata/sf0.001"
SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def _stage(spark, tmp_path, parts=3) -> str:
    stage = str(tmp_path / "input")
    load_table(spark, SF, "events").repartition(parts).write.mode(
        "overwrite"
    ).parquet(stage)
    return stage


def test_running_totals_state_survives_batches(spark, tmp_path):
    stage = _stage(spark, tmp_path)
    stream = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .load(stage)
        .select("user_id", "value")
    )
    out = running_totals_stream(stream)
    name = "state_totals"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode appends one row per key per batch: last row per key
    # is the final state
    got = {
        r.user_id: (r.n, r.total)
        for r in spark.table(name).collect()  # later rows overwrite earlier
    }
    # (dict build keeps the LAST occurrence per key only if ordered —
    # sort by n, which is monotone per key)
    rows = sorted(spark.table(name).collect(), key=lambda r: r.n)
    got = {r.user_id: (r.n, r.total) for r in rows}

    want = {
        r.user_id: (r.n, r.total)
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-9)


CHUNK_SCHEMA = "doc_id BIGINT, page_idx INT, page BINARY, n_pages INT"


def _chunk_rows():
    """3 docs × pages, deliberately out of order and with a duplicate
    page (redelivery): doc 1 = b'hello world!' in 3 pages, doc 2 =
    b'ab' in 1 page, doc 3 = b'xxxxyyyy' in 2 pages."""
    return [
        (1, 2, b"rld!", 3),
        (2, 0, b"ab", 1),
        (1, 0, b"hell", 3),
        (3, 1, b"yyyy", 2),
        (1, 1, b"o wo", 3),
        (1, 1, b"o wo", 3),  # duplicate redelivery
        (3, 0, b"xxxx", 2),
    ]


def test_reassemble_stream_cross_batch_exactly_once(spark, tmp_path):
    """Pages split across micro-batches reassemble to the original
    payloads, each doc emitted exactly once, duplicates idempotent."""
    stage = str(tmp_path / "chunks")
    spark.createDataFrame(_chunk_rows(), CHUNK_SCHEMA).repartition(
        4
    ).write.mode("overwrite").parquet(stage)
    stream = sp.read_file_stream(
        spark, stage, CHUNK_SCHEMA, max_files_per_trigger=1
    )
    out = reassemble_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("reasm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r.doc_id: bytes(r.payload) for r in spark.table("reasm").collect()}
    assert rows == {1: b"hello world!", 2: b"ab", 3: b"xxxxyyyy"}
    assert spark.table("reasm").count() == 3  # exactly once per doc


def test_reassemble_stream_incomplete_doc_not_emitted(spark, tmp_path):
    """A doc missing a page stays in state and is never emitted with
    a truncated payload. (TTL eviction itself is pinned on the
    running-totals operator — same timeout machinery; availableNow
    never terminates under ProcessingTimeTimeout, so this drain runs
    without TTL.)"""
    stage = str(tmp_path / "chunks2")
    rows = [r for r in _chunk_rows() if not (r[0] == 1 and r[1] == 2)]
    spark.createDataFrame(rows, CHUNK_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    stream = sp.read_file_stream(spark, stage, CHUNK_SCHEMA)
    out = reassemble_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("reasm2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.doc_id for r in spark.table("reasm2").collect()}
    assert got == {2, 3}  # doc 1 incomplete: never emitted


def test_foreach_batch_upsert_sink(spark, tmp_path):
    stage = _stage(spark, tmp_path)
    target = str(tmp_path / "target")
    stream = sp.read_file_stream(spark, stage, SCHEMA).select(
        "event_id", "user_id", "value"
    )
    q = foreach_batch_upsert(
        stream, target, keys=["event_id"], checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    assert spark.read.parquet(target).count() == 1000

    # replaying the same input through a NEW stream (fresh checkpoint)
    # re-upserts the same keys — target must not grow
    stream2 = sp.read_file_stream(spark, stage, SCHEMA).select(
        "event_id", "user_id", "value"
    )
    q2 = foreach_batch_upsert(
        stream2, target, keys=["event_id"], checkpoint=str(tmp_path / "ckpt2")
    )
    q2.awaitTermination()
    assert spark.read.parquet(target).count() == 1000


def test_foreach_batch_upsert_swap_leaves_no_staging(spark, tmp_path):
    import os

    stage = _stage(spark, tmp_path)
    target = str(tmp_path / "target")
    stream = sp.read_file_stream(spark, stage, SCHEMA).select("event_id", "value")
    foreach_batch_upsert(
        stream, target, keys=["event_id"], checkpoint=str(tmp_path / "ckpt")
    ).awaitTermination()
    assert not os.path.exists(target + ".__staging")
    assert not os.path.exists(target + ".__old")
    assert spark.read.parquet(target).count() == 1000


def test_foreach_batch_upsert_partitioned(spark, tmp_path):
    """partition_col path: dynamic-partition upsert converges to the
    same keyed table, laid out as part=N directories."""
    import os

    stage = _stage(spark, tmp_path)
    target = str(tmp_path / "target")

    def partitioned_stream():
        return (
            sp.read_file_stream(spark, stage, SCHEMA)
            .select("event_id", "user_id", "value")
            .withColumn("part", F.pmod(F.col("user_id"), F.lit(4)))
        )

    foreach_batch_upsert(
        partitioned_stream(),
        target,
        keys=["event_id"],
        checkpoint=str(tmp_path / "ckpt"),
        partition_col="part",
    ).awaitTermination()
    assert spark.read.parquet(target).count() == 1000
    assert sorted(
        d for d in os.listdir(target) if d.startswith("part=")
    ) == ["part=0", "part=1", "part=2", "part=3"]

    # replay through a fresh checkpoint: keyed upsert keeps it at 1000
    foreach_batch_upsert(
        partitioned_stream(),
        target,
        keys=["event_id"],
        checkpoint=str(tmp_path / "ckpt2"),
        partition_col="part",
    ).awaitTermination()
    assert spark.read.parquet(target).count() == 1000


def test_running_totals_ttl_evicts_idle_keys(spark, tmp_path):
    """ProcessingTimeTimeout eviction: a key idle past the TTL is
    dropped from the state store; later data restarts from zero.

    Runs a CONTINUOUS trigger (availableNow never terminates under
    processing-time timeouts: Spark keeps scheduling empty batches to
    service them) and polls the sink.
    """
    import time
    from datetime import datetime

    stage = str(tmp_path / "input")
    out = str(tmp_path / "out")
    ts = datetime(2024, 1, 1)

    def emit(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(stage)

    def sink_rows() -> set[tuple[int, int]]:
        try:
            return {
                (r.user_id, r.n) for r in spark.read.parquet(out).collect()
            }
        except Exception:  # sink dir not created yet
            return set()

    def wait_for(pred, timeout_s=60):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if pred(sink_rows()):
                return
            time.sleep(0.5)
        raise AssertionError(f"sink never satisfied: {sink_rows()}")

    emit([(i, ts, 1, "view", 1.0, "{}") for i in range(3)]
         + [(10 + i, ts, 2, "view", 1.0, "{}") for i in range(2)])

    stream = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .load(stage)
        .select("user_id", "value")
    )
    q = (
        running_totals_stream(stream, ttl_ms=500)
        .writeStream.foreachBatch(
            lambda df, _eid: df.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        wait_for(lambda rows: {(1, 3), (2, 2)} <= rows)
        time.sleep(2.0)  # idle past the 500 ms TTL → both keys evicted
        emit([(30, ts, 2, "view", 1.0, "{}")])
        # restart-from-zero proves the state was really removed
        wait_for(lambda rows: (2, 1) in rows)
    finally:
        q.stop()

    rows = sink_rows()
    assert (2, 3) not in rows  # continuation would mean no eviction
    assert {n for (u, n) in rows if u == 1} == {3}


def test_fanout_two_sinks_consistent_and_replay_idempotent(spark, tmp_path):
    """Detail and metrics sinks must agree (Σ n_rows == detail count,
    Σ value_sum_fp == quantized detail sum); a second run with the
    SAME checkpoint is a no-op (no duplicate epochs)."""
    from eco_pulse_lakehouse_spark.streaming.stateful import (
        foreach_batch_fanout,
    )

    stage = _stage(spark, tmp_path)
    base = str(tmp_path / "fan")
    stream = sp.read_file_stream(
        spark, stage, SCHEMA, max_files_per_trigger=1
    ).select("event_id", "user_id", "value")
    foreach_batch_fanout(
        stream, f"{base}/detail", f"{base}/metrics", f"{base}/ckpt"
    ).awaitTermination()
    detail = spark.read.parquet(f"{base}/detail")
    metrics = spark.read.parquet(f"{base}/metrics")
    n_detail = detail.count()
    assert n_detail == 1000
    m = metrics.agg(
        F.sum("n_rows").alias("n"), F.sum("value_sum_fp").alias("s")
    ).first()
    assert m.n == n_detail
    s_detail = detail.agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("s")
    ).first().s
    assert m.s == s_detail
    assert metrics.count() >= 2  # maxFilesPerTrigger=1 → multiple epochs

    # replay with the SAME checkpoint: committed offsets → no new data
    stream2 = sp.read_file_stream(
        spark, stage, SCHEMA, max_files_per_trigger=1
    ).select("event_id", "user_id", "value")
    foreach_batch_fanout(
        stream2, f"{base}/detail", f"{base}/metrics", f"{base}/ckpt"
    ).awaitTermination()
    assert spark.read.parquet(f"{base}/detail").count() == n_detail


def test_transform_with_state_v2_running_totals(spark, tmp_path):
    """Arbitrary-state v2 (transformWithStateInPandas): running
    per-key totals across batches == batch GROUP BY. SKIPS until the
    image gains google.protobuf — the v2 state server's wire
    protocol needs it (stateful.py:running_totals_tws docstring)."""
    import pytest

    pytest.importorskip("google.protobuf")
    import os

    from pyspark.sql import functions as F

    from eco_pulse_lakehouse_spark.streaming.stateful import (
        running_totals_tws,
    )

    src = str(tmp_path / "in")
    spark.range(0, 100).selectExpr(
        "id % 5 AS user_id", "id AS v_fp"
    ).repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id BIGINT, v_fp BIGINT").parquet(src)
    )
    q = (
        running_totals_tws(stream)
        .writeStream.format("memory")
        .queryName("tws_v2")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
    final = {
        r.user_id: (r.n, r.total_fp)
        for r in spark.table("tws_v2")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    expected = {
        r.user_id: (r.n, r.t)
        for r in spark.range(0, 100)
        .selectExpr("id % 5 AS user_id", "id AS v_fp")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("v_fp").alias("t"))
        .collect()
    }
    assert final == expected
