"""T7 — incremental gold maintenance: N merge cycles must equal one
full recompute (the overwrite-the-world loop the reference runs every
60 s, gold_batch_job.py:96-104, replaced by O(batch) upserts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.plans.gold import gold_risk_domain, run_gold_cycle
from tests.fixtures import fire_events, weather_events


def test_two_cycles_equal_full_recompute(spark, tmp_path):
    fires = fire_events(spark)
    weather = weather_events(spark)
    target = str(tmp_path / "gold")

    batch1 = fires.filter(F.col("timestamp") <= 1_700_000_040.0)
    batch2 = fires.filter(F.col("timestamp") > 1_700_000_040.0)

    run_gold_cycle(batch1, weather, target)
    run_gold_cycle(batch2, weather, target)

    got = sorted(
        (r.timestamp, r.fire_lat, r.fire_lon, r.risk_level)
        for r in spark.read.parquet(target).collect()
    )
    want = sorted(
        (r.timestamp, r.fire_lat, r.fire_lon, r.risk_level)
        for r in gold_risk_domain(fires, weather).collect()
    )
    assert got == want


def test_replayed_batch_is_idempotent(spark, tmp_path):
    fires = fire_events(spark)
    weather = weather_events(spark)
    target = str(tmp_path / "gold")

    run_gold_cycle(fires, weather, target)
    n1 = spark.read.parquet(target).count()
    run_gold_cycle(fires, weather, target)  # same batch again (replay)
    n2 = spark.read.parquet(target).count()
    assert n1 == n2
