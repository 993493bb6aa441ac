"""Distributed total-order ranking — the scale path for global
row_number (SURVEY.md §2.6 O2 at 100 TB).

A window with no PARTITION BY collapses to one task; the distributed
form is the classic two-pass composition:

  1. repartitionByRange on the full (totally-ordered, tiebroken)
     sort key — range partition p holds rows strictly before p+1;
  2. count rows per partition (tiny driver-side collect: one long
     per partition) and prefix-sum the offsets;
  3. local row_number per partition (Window.partitionBy(pid) —
     parallel, no global shuffle point) + broadcast offset.

Cost: one range shuffle + one count pass — no single-reducer stage
anywhere. Result is identical to the single-partition window as long
as the order is total (callers must include a unique tiebreak).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__pid"
_LOCAL = "__local_rn"


def global_row_number(
    df: DataFrame,
    order_by: Sequence[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Total-order row_number without a single-partition window.

    ``order_by`` must be a TOTAL order (unique tiebreak included) —
    the same requirement the one-partition form has for determinism,
    here it also guarantees the range/local composition is exact.
    """
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    ranged = df.repartitionByRange(int(n), *order_by).withColumn(
        _PID, F.spark_partition_id()
    )
    # repartitionByRange SAMPLES boundaries per execution — the counts
    # pass and the ranking pass must see the SAME partitioning, so pin
    # the partitioned data (persist on a cluster; localCheckpoint here).
    ranged = ranged.localCheckpoint(eager=True)
    # one long per partition to the driver — O(partitions), not O(rows)
    counts = {
        r[_PID]: r["cnt"]
        for r in ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    # broadcast-join the offsets (a when-chain would be an
    # O(partitions)-deep expression tree — pathological at cluster
    # partition counts)
    off_df = df.sparkSession.createDataFrame(
        offsets, f"{_PID} INT, __offset LONG"
    )
    w = Window.partitionBy(_PID).orderBy(*order_by)
    return (
        ranged.withColumn(_LOCAL, F.row_number().over(w))
        .join(F.broadcast(off_df), _PID)
        .withColumn(out_col, (F.col("__offset") + F.col(_LOCAL)).cast("long"))
        .drop(_PID, _LOCAL, "__offset")
    )
