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


def test_untouched_partitions_not_rewritten(spark, tmp_path):
    """The dynamic-partition write must leave partitions the batch
    doesn't touch byte-identical — the O(batch) write guarantee."""
    import hashlib

    fires = fire_events(spark)
    weather = weather_events(spark)
    target = tmp_path / "gold"

    # Day 1 and day 2 batches: shift batch2 timestamps by +1 day so
    # the two cycles land in different gold_date partitions.
    batch1 = fires.filter(F.col("timestamp") <= 1_700_000_040.0)
    batch2 = fires.filter(F.col("timestamp") > 1_700_000_040.0).withColumn(
        "timestamp", F.col("timestamp") + 86_400.0
    )

    def partition_digests() -> dict[str, list[tuple[str, str]]]:
        out: dict[str, list[tuple[str, str]]] = {}
        for f in sorted(target.rglob("*.parquet")):
            part_dir = f.relative_to(target).parts[0]
            out.setdefault(part_dir, []).append(
                (f.name, hashlib.sha256(f.read_bytes()).hexdigest())
            )
        return out

    run_gold_cycle(batch1, weather, str(target))
    before = partition_digests()
    assert len(before) == 1  # one day-partition so far

    run_gold_cycle(batch2, weather, str(target))
    after = partition_digests()
    assert len(after) == 2  # new day added

    (day1,) = before.keys()
    assert after[day1] == before[day1]  # byte-identical, never rewritten
