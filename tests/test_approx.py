"""Accuracy bounds for the sketch-based 100 TB-path aggregates
(promised by the corpus docstrings of the rows-only entries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.catalog import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    ev = load_table(spark, SF, "events")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id", 0.05)).first()[0]
    assert abs(approx - exact) / exact <= 0.15  # 3x the 5% rsd


def test_approx_percentile_close_to_exact(spark):
    li = load_table(spark, SF, "lineitem")
    rows = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(1000)).alias(
            "approx"
        ),
    ).collect()
    for r in rows:
        assert abs(r.approx - r.exact) / r.exact <= 0.02
