"""Gold-risk pipeline semantics pinned to the reference
(gold_batch_job.py:22-78): boundary thresholds, CASE order,
latest-per-station selection, the 20-degree strict inequality, and
grid-join == naive-join equivalence (SURVEY.md §7.4.3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.functions.scalar import risk_level, risk_rank
from eco_pulse_lakehouse_spark.plans.gold import gold_risk_domain
from tests.fixtures import fire_events, weather_events


def _run(spark, use_grid):
    return gold_risk_domain(
        fire_events(spark), weather_events(spark), use_grid_join=use_grid
    ).collect()


def test_gold_matches_reference_semantics(spark):
    rows = _run(spark, use_grid=True)
    by_fire = {round(r.distance_deg, 4): r for r in rows}

    # d=20.0 and d=25 fires are excluded (strict < 20, gold_batch_job.py:61)
    assert set(by_fire) == {0.0, 5.0, 19.99, 1.0}

    # station selection: ONLY the latest Madrid reading (wind=30,
    # temp=303.15, hum=30) pairs — boundary row hits every >=/<= edge
    # → EXTREME for h-confidence fires (gold_batch_job.py:66-74 order)
    assert by_fire[0.0].risk_level == "EXTREME"
    assert by_fire[0.0].wind_speed == 30.0
    assert by_fire[5.0].risk_level == "EXTREME"
    assert by_fire[19.99].risk_level == "EXTREME"
    # n-confidence → LOW regardless of measures
    assert by_fire[1.0].risk_level == "LOW"

    # output schema: exactly the 9 reference columns, in order
    cols = [
        "timestamp", "fire_lat", "fire_lon", "weather_station",
        "wind_speed", "temperature", "humidity", "risk_level", "distance_deg",
    ]
    assert list(rows[0].asDict().keys()) == cols


def test_grid_join_equals_naive_join(spark):
    naive = sorted(
        (round(r.distance_deg, 6), r.risk_level) for r in _run(spark, False)
    )
    grid = sorted(
        (round(r.distance_deg, 6), r.risk_level) for r in _run(spark, True)
    )
    assert naive == grid


def test_case_chain_order_and_boundaries(spark):
    """Property-pin the 5-way CASE at the exact thresholds
    (30 wind / 20 wind / 303.15 temp / 30 humidity)."""
    cases = [
        # (conf, wind, temp, hum) -> expected
        (("h", 30.0, 303.15, 30.0), "EXTREME"),
        (("h", 30.0, 303.149, 30.0), "VERY_HIGH"),   # temp just below
        (("h", 30.0, 303.15, 30.01), "VERY_HIGH"),   # humidity just above
        (("h", 29.99, 400.0, 0.0), "HIGH"),          # wind in [20, 30)
        (("h", 20.0, 400.0, 0.0), "HIGH"),
        (("h", 19.99, 400.0, 0.0), "MODERATE"),
        (("n", 99.0, 400.0, 0.0), "LOW"),
        (("l", 99.0, 400.0, 0.0), "LOW"),
    ]
    df = spark.createDataFrame(
        [c for c, _ in cases],
        "confidence STRING, wind DOUBLE, temp DOUBLE, hum DOUBLE",
    )
    out = df.select(
        risk_level(
            F.col("confidence"), F.col("wind"), F.col("temp"), F.col("hum")
        ).alias("lvl")
    ).collect()
    assert [r.lvl for r in out] == [want for _, want in cases]


def test_risk_rank_ordering(spark):
    df = spark.createDataFrame(
        [("EXTREME",), ("VERY_HIGH",), ("HIGH",), ("MODERATE",), ("LOW",), ("??",)],
        "risk STRING",
    )
    out = df.select(risk_rank(F.col("risk")).alias("rk")).collect()
    assert [r.rk for r in out] == [0, 1, 2, 3, 4, 5]


def test_gold_topk_refinement_equals_naive_ranking(spark):
    """The progressive-radius lemma: gold_risk_events_topk (narrow
    pass + strict-count resolution + fallback) must equal ranking
    the full dense ε-join directly — at BOTH a narrow_frac that
    resolves most fires and one that forces most through the
    fallback, so both code paths are pinned."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from eco_pulse_lakehouse_spark.plans.gold import (
        gold_risk_events,
        gold_risk_events_topk,
    )

    sf = "/root/testdata/sf0.001"
    w = Window.partitionBy("fire_id").orderBy(
        F.col("distance_val").asc(), F.col("station_id").asc()
    )
    naive = {
        tuple(r)
        for r in gold_risk_events(spark, sf)
        .withColumn("k_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("k_rank") <= 3)
        .collect()
    }
    for frac in (2, 8, 64):
        got = {
            tuple(r)
            for r in gold_risk_events_topk(spark, sf, k=3, narrow_frac=frac)
            .collect()
        }
        assert got == naive and len(naive) > 0, frac
