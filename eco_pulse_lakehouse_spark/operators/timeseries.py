"""Time-series regularization — gap-fill and forward-fill.

The reference's gold layer aggregates per (location, day) but simply
omits silent days (/root/reference/src/processing/gold_batch_job.py:
the GROUP BY produces rows only where readings exist); any dashboard
or model-feature consumer then sees a ragged series. These operators
produce a REGULAR per-key grid and carry observations forward — the
standard feature-store densification pass.

Shape at scale:

  per-key bounds  — one aggregation (min/max bucket per key)
  grid            — sequence() + explode: generated map-side from the
                    one-row-per-key bounds table, never shuffled wide
  observations    — pre-aggregated per (key, bucket), then an
                    equi-join onto the grid on (key, bucket)
  forward fill    — last(value, ignorenulls) over an UNBOUNDED
                    PRECEDING window per key: ONE shuffle on the key,
                    one sort per key — no iterative self-joins

Grid cardinality is keys × buckets regardless of raw row count, so
at 100 TB the dense grid is usually SMALLER than the input; the only
wide shuffle is the per-(key, bucket) pre-aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_daily(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_agg: Column,
    fill_col: str = "filled_value",
) -> DataFrame:
    """Dense per-(key, day) series over each key's [min_day, max_day]
    span, with missing days carried forward from the last observed
    day (NULL before the first observation — nothing to carry).

    ``value_agg`` is the per-(key, day) aggregate to densify (pass a
    decimal-accumulated sum for cross-engine exactness). Adds
    ``observed`` (was there any raw row that day) alongside the
    forward-filled value.
    """
    day = F.date_trunc("day", F.col(ts_col))
    per_day = (
        events.groupBy(F.col(key_col), day.alias("day"))
        .agg(value_agg.alias("__v"))
    )
    bounds = per_day.groupBy(key_col).agg(
        F.min("day").alias("__lo"), F.max("day").alias("__hi")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence("__lo", "__hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    joined = grid.join(per_day, [key_col, "day"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "day",
        F.col("__v").isNotNull().alias("observed"),
        F.last("__v", ignorenulls=True).over(w).alias(fill_col),
    )
