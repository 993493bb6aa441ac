"""Flagship #5 — forward-looking sensor-health mart.

The reference's gold job classifies CURRENT readings against static
thresholds (gold_batch_job.py:22-78 — risk levels over latest
values); this flagship is its predictive sibling: per key, fit the
bit-exact Holt forecaster on every reading EXCEPT the latest, score
the latest reading against its own one-step forecast, and classify
the residual — the "is this sensor drifting from its own trend"
report a monitoring mart serves next to the reactive risk table.

Composed entirely from certified pieces: the w7-style ordered fold
substrate, w28's holt_fold, and the f_case-style residual
classification — so the END-TO-END plan carries a hard oracle.
ONE groupBy exchange; the fold is per-row array math; residual and
thresholds are IEEE-deterministic on bit-identical operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.operators.timeseries import holt_fold

# |residual| thresholds for the status ladder (value units; the
# corpus value range is ~0-1000 with per-user noise ~10)
WARN_ABS = 10.0
ALERT_ABS = 25.0


def sensor_health(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    min_history: int = 3,
) -> DataFrame:
    """Per-key health row: (key, n_history, last_value, forecast,
    residual, status). Keys need ``min_history`` + 1 readings (the
    Holt init needs two history points). status: 'ok' below WARN_ABS,
    'watch' below ALERT_ABS, else 'alert' — strict lower-bound
    comparisons, deterministic on bit-identical residuals."""
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                ts_col, tiebreak_col,
                F.col(value_col).cast("double").alias("v"),
            )
        )
    )
    per_key = events.groupBy(key_col).agg(arr.alias("__arr"))
    vs = F.transform(F.col("__arr"), lambda s: s.getField("v"))
    n = F.size(vs)
    staged = (
        per_key.filter(n >= F.lit(min_history + 1))
        .select(
            F.col(key_col),
            (n - 1).cast("bigint").alias("n_history"),
            F.get(vs, n - 1).alias("last_value"),
            F.slice(vs, 1, n - 1).alias("__hist"),
        )
        .withColumn("__hb", holt_fold(F.col("__hist")))
    )
    forecast = F.col("__hb").getField("l") + F.col("__hb").getField("b")
    residual = F.col("last_value") - forecast
    status = (
        F.when(F.abs(residual) < F.lit(WARN_ABS), F.lit("ok"))
        .when(F.abs(residual) < F.lit(ALERT_ABS), F.lit("watch"))
        .otherwise(F.lit("alert"))
    )
    return staged.select(
        F.col(key_col),
        "n_history",
        "last_value",
        forecast.alias("forecast"),
        residual.alias("residual"),
        status.alias("status"),
    )
