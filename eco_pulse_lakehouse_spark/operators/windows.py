"""Window operators: latest-per-key, keep-best dedup, rolling frames.

W1/W2/W3 in SURVEY.md §2.5. The reference implements W1 with
row_number over (partition location_id order timestamp desc) then
rank==1 (gold_batch_job.py:32-35) and W2 in pandas via sort +
drop_duplicates (app.py:63-67); both are the same ranking-window
shape, expressed here once.

Determinism: callers MUST pass a unique tiebreak column in
``order_by`` (SURVEY.md §7.4.5) — row_number over ties is otherwise
nondeterministic across runs/engines.

Scale: the window shuffles once on the partition keys. Spark's
WindowGroupLimit (3.5+) pushes the rank<=k limit below the shuffle
for rank functions, so latest-per-key does a partial top-k map-side
— this is the plan we want at 100 TB; verified in tests via explain.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__rn"


def top_k_per_key(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    k: int = 1,
    keep_rank_as: str | None = None,
) -> DataFrame:
    """Generic ranking-window limiter: keep the first k rows per key.

    latest-per-key == order_by [ts.desc(), id] with k=1.
    keep-best      == order_by [rank.asc(), dist.asc(), id] with k=1.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(_RN, F.row_number().over(w)).filter(F.col(_RN) <= k)
    if keep_rank_as:
        return out.withColumnRenamed(_RN, keep_rank_as)
    return out.drop(_RN)


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """W1 — newest row per key (gold_batch_job.py:32-35 shape)."""
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    return top_k_per_key(df, list(key_cols), order, k=1)


def keep_best(
    df: DataFrame,
    key_cols: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """W2 — best row per key under an explicit multi-column order
    (app.py:63-67: sort by (fire_id, risk_rank, distance) + drop_duplicates).
    """
    return top_k_per_key(df, list(key_cols), list(order_by), k=1)


def rolling(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    frame_rows: tuple[int, int],
    aggs: dict[str, Column],
) -> DataFrame:
    """W3 — ROWS-frame rolling aggregates (north-star time-series surface).

    ``aggs`` maps output column name -> aggregate expression built on
    input columns; each is applied ``.over`` the frame window.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(frame_rows[0], frame_rows[1])
    )
    out = df
    for name, expr in aggs.items():
        out = out.withColumn(name, expr.over(w))
    return out


def capped_sessionize(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    gap_s: int = 1800,
    cap_s: int = 7200,
) -> DataFrame:
    """Sessionization with BOTH an inactivity gap and a maximum
    session duration: an event opens a new session when the gap from
    the previous event exceeds ``gap_s`` OR the elapsed time since
    the CURRENT session's start exceeds ``cap_s`` (the
    runaway-session guard analytics stacks add on top of plain
    gap-splitting — w7 covers the gap-only form).

    The duration cap makes assignment a true sequential RECURRENCE
    (each session's start depends on every earlier split decision),
    so the lag+running-sum trick behind w7 cannot express it. Per
    key: one shuffle groups the sorted (epoch, id) array, then a
    single struct-fold replays the recurrence row-locally — the
    q9_cusum discipline, integer-exact end to end, so the corpus
    oracle (w20_capped_sessions) replays it with a recursive CTE
    (DuckDB's list_reduce struct accumulator is unsound for
    cross-field recurrences — memory rule).

    Scale: per-key arrays bound memory like sax_words — for very
    long keys pre-chunk by (key, coarse bucket) with one overlap row
    carrying (sid, start, prev) forward. Returns
    (key, tiebreak, session_id) with session_id 1-based per key."""
    e = F.col(ts_col).cast("timestamp_ltz").cast("long")
    arr = F.array_sort(
        F.collect_list(
            F.struct(e.alias("e"), F.col(tiebreak_col).alias("id"))
        )
    )
    grouped = events.groupBy(key_col).agg(arr.alias("__v"))
    sentinel = -(10**15)
    acc0 = F.struct(
        F.lit(0).alias("sid"),
        F.lit(sentinel).cast("long").alias("start"),
        F.lit(sentinel).cast("long").alias("prev"),
        F.array().cast("array<struct<id:bigint,sid:int>>").alias("out"),
    )

    def step(acc, x):
        is_new = (x["e"] - acc["prev"] > gap_s) | (
            x["e"] - acc["start"] > cap_s
        )
        sid = F.when(is_new, acc["sid"] + 1).otherwise(acc["sid"])
        start = F.when(is_new, x["e"]).otherwise(acc["start"])
        return F.struct(
            sid.alias("sid"),
            start.alias("start"),
            x["e"].alias("prev"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x["id"].cast("bigint").alias("id"),
                        sid.cast("int").alias("sid"),
                    )
                ),
            ).alias("out"),
        )

    folded = grouped.select(
        key_col,
        F.aggregate(F.col("__v"), acc0, step).getField("out").alias("__out"),
    )
    return folded.select(
        key_col, F.explode("__out").alias("__r")
    ).select(
        key_col,
        F.col("__r.id").alias(tiebreak_col),
        F.col("__r.sid").alias("session_id"),
    )


def rolling_median(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    n_rows: int = 8,
) -> DataFrame:
    """EXACT rolling (lower-)median over the last ``n_rows`` readings
    per key — the robust smoother dashboards put beside the rolling
    mean (w3): one outlier moves the mean by outlier/n but leaves the
    median untouched. LOWER median (element (n+1)//2 of the sorted
    frame) rather than the interpolated midpoint, so the result is an
    ELEMENT of the data — exact in any engine, no float-interpolation
    parity risk (the a27/a31 selection discipline).

    Shape: collect_list over the ROWS frame + array_sort + one
    element_at — per-row work is O(frame log frame) entirely inside
    the window projection, ONE shuffle on the key. NULL values must
    be filtered upstream: Spark's collect_list skips NULLs while
    DuckDB's list() keeps them, so the frames would disagree.
    Returns (key, tiebreak, value, rolling_median)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
        .rowsBetween(-(n_rows - 1), Window.currentRow)
    )
    arr = F.array_sort(
        F.collect_list(F.col(value_col).cast("double")).over(w)
    )
    med = F.element_at(
        arr, F.floor((F.size(arr) + 1) / 2).cast("int")
    )
    return events.select(
        F.col(key_col),
        F.col(tiebreak_col),
        F.col(value_col),
        med.alias("rolling_median"),
    )
