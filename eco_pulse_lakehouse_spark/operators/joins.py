"""Join operators: cross, range/distance (naive + grid-accelerated), equi.

J1-J3 in SURVEY.md §2.3. The reference's entire join surface is one
crossJoin + distance filter (gold_batch_job.py:52-61) — a
BroadcastNestedLoopJoin that is O(n*m) and would never survive 100 TB.
The grid-bucketed rewrite here turns it into a shuffle equi-join on
grid cells with an exact distance refine, which scales linearly in
candidate pairs and shuffles only on the cell key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.functions.scalar import euclidean_distance_deg


def cross_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """J1 — Cartesian product (gold_batch_job.py:52)."""
    return left.crossJoin(right)


def distance_join_naive(
    points: DataFrame,
    sites: DataFrame,
    max_distance: float,
    p_lat: str = "lat",
    p_lon: str = "lon",
    s_lat: str = "s_lat",
    s_lon: str = "s_lon",
    distance_col: str = "distance_deg",
) -> DataFrame:
    """J2 as built: cross join + Euclidean-degree filter.

    Catalyst folds the filter into the join condition
    (PushPredicateThroughJoin) → BroadcastNestedLoopJoin when a side
    is small. Correct at any scale, fast only when min(n, m) is small.
    """
    dist = euclidean_distance_deg(
        F.col(p_lat), F.col(p_lon), F.col(s_lat), F.col(s_lon)
    )
    return points.crossJoin(sites).withColumn(distance_col, dist).filter(
        F.col(distance_col) < max_distance
    )


def distance_join_grid(
    points: DataFrame,
    sites: DataFrame,
    max_distance: float,
    p_lat: str = "lat",
    p_lon: str = "lon",
    s_lat: str = "s_lat",
    s_lon: str = "s_lon",
    distance_col: str = "distance_deg",
) -> DataFrame:
    """J2 at scale: grid-cell equi-join + exact refine (SURVEY.md §7.3).

    Both sides get a cell id ``(floor(lat/eps), floor(lon/eps))`` with
    eps = max_distance. The probe side (points) is exploded to its
    3x3 neighborhood so every true pair shares a cell; the join is
    then a plain shuffle/broadcast HASH equi-join on the cell key,
    and the exact Euclidean predicate refines candidates. Identical
    output to :func:`distance_join_naive`, hash-join physical plan.

    Cost: |points| x 9 rows shuffled on cell — linear, skew handled
    by AQE skew-join splitting. This is the form that survives 100 TB.
    """
    eps = float(max_distance)
    cell_x = F.floor(F.col(s_lat) / eps)
    cell_y = F.floor(F.col(s_lon) / eps)
    sites_c = sites.withColumn(
        "__cell", F.concat_ws(":", cell_x, cell_y)
    )

    offsets = F.array(*[F.lit(i) for i in (-1, 0, 1)])
    points_c = (
        points.withColumn("__cx", F.floor(F.col(p_lat) / eps))
        .withColumn("__cy", F.floor(F.col(p_lon) / eps))
        .withColumn("__dx", F.explode(offsets))
        .withColumn("__dy", F.explode(offsets))
        .withColumn(
            "__cell",
            F.concat_ws(":", F.col("__cx") + F.col("__dx"), F.col("__cy") + F.col("__dy")),
        )
        .drop("__cx", "__cy", "__dx", "__dy")
    )

    dist = euclidean_distance_deg(
        F.col(p_lat), F.col(p_lon), F.col(s_lat), F.col(s_lon)
    )
    return (
        points_c.join(sites_c, on="__cell", how="inner")
        .drop("__cell")
        .withColumn(distance_col, dist)
        .filter(F.col(distance_col) < max_distance)
    )


def distance_join_grid_band(
    points: DataFrame,
    sites: DataFrame,
    max_distance: float,
    p_lat: str = "lat",
    p_lon: str = "lon",
    s_lat: str = "s_lat",
    s_lon: str = "s_lon",
    distance_col: str = "distance_deg",
) -> DataFrame:
    """J2 at scale, ×4-replication variant of :func:`distance_join_grid`
    (VERDICT r06 item 5): cells of width 2·eps with HALF-AWARE
    single-neighbor probing per dimension.

    With eps-width cells every probe must visit its full 3×3
    neighborhood (×9 replication). With 2·eps cells, a probe in the
    lower half of its cell can only also match the cell below (per
    dimension), upper half only the cell above — exactly one neighbor
    each, so the probe replicates ×2 per dimension = ×4 in 2-D
    (the 1-D argument of value_range_join_band applied per axis).
    Every true pair (|Δlat| < eps AND |Δlon| < eps ⇐ dist < eps)
    shares EXACTLY one cell — per dimension the site's bucket is one
    of the probe's two, and the probe's two are distinct — so no
    post-join dedup is needed and the output is identical to
    :func:`distance_join_grid` / :func:`distance_join_naive`.

    Trade-off vs the ×9 form: 2.25× less probe-side shuffle volume,
    but candidate pairs per cell grow ~4× (cell area (2eps)² vs
    eps²), so the refine filters more. The band form wins when the
    shuffle dominates (eps small relative to point density — the
    100 TB regime where replication volume is the bottleneck); the
    ×9 form wins when refine CPU dominates. Measured numbers in
    SCALE.md."""
    eps = float(max_distance)
    w = 2.0 * eps
    sites_c = sites.withColumn(
        "__cell",
        F.concat_ws(
            ":", F.floor(F.col(s_lat) / w), F.floor(F.col(s_lon) / w)
        ),
    )
    bx = F.floor(F.col(p_lat) / w)
    by = F.floor(F.col(p_lon) / w)
    nx = F.when(
        (F.col(p_lat) - bx.cast("double") * w) < eps, bx - 1
    ).otherwise(bx + 1)
    ny = F.when(
        (F.col(p_lon) - by.cast("double") * w) < eps, by - 1
    ).otherwise(by + 1)
    points_c = (
        points.withColumn("__cx", F.explode(F.array(bx, nx)))
        .withColumn("__cy", F.explode(F.array(by, ny)))
        .withColumn("__cell", F.concat_ws(":", "__cx", "__cy"))
        .drop("__cx", "__cy")
    )
    dist = euclidean_distance_deg(
        F.col(p_lat), F.col(p_lon), F.col(s_lat), F.col(s_lon)
    )
    return (
        points_c.join(sites_c, on="__cell", how="inner")
        .drop("__cell")
        .withColumn(distance_col, dist)
        .filter(F.col(distance_col) < max_distance)
    )


def value_range_join(
    left: DataFrame,
    right: DataFrame,
    l_val: str,
    r_val: str,
    epsilon: float,
    how: str = "inner",
) -> DataFrame:
    """1-D theta join |l - r| < eps via the same bucketing trick.

    Used for the corpus phrasing of J2 over numeric columns
    (e.g. customer/supplier acctbal proximity).

    Inner-only: the probe side is bucket-replicated ×3 and the
    post-join epsilon filter drops null-extended rows, so any outer
    variant would silently degenerate to inner (or triplicate
    unmatched rows without the filter).
    """
    if how != "inner":
        raise ValueError(
            f"value_range_join is inner-only (got how={how!r}); outer "
            "range semantics need unmatched-row re-attachment"
        )
    lb = left.withColumn("__b0", F.floor(F.col(l_val) / epsilon))
    rb = right.withColumn("__b", F.floor(F.col(r_val) / epsilon))
    lb = lb.withColumn("__off", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
    lb = lb.withColumn("__b", F.col("__b0") + F.col("__off")).drop("__b0", "__off")
    return (
        lb.join(rb, on="__b", how=how)
        .drop("__b")
        .filter(F.abs(F.col(l_val) - F.col(r_val)) < epsilon)
    )


def value_range_join_band(
    left: DataFrame,
    right: DataFrame,
    l_val: str,
    r_val: str,
    epsilon: float,
    how: str = "inner",
) -> DataFrame:
    """|l - r| < eps with ×2 probe replication instead of ×3.

    Buckets of width 2·eps: a probe in the lower half of its bucket
    can only also match the bucket below, upper half only the bucket
    above — exactly one neighbor each, so the probe side replicates
    ×2 (×4 in 2-D) versus the ×3 (×9) of eps-width buckets
    (value_range_join). Each true pair shares exactly one bucket —
    no post-dedup needed. Same output, same oracle, 33% less probe
    shuffle. Inner-only, same reason as value_range_join.
    """
    if how != "inner":
        raise ValueError(
            f"value_range_join_band is inner-only (got how={how!r}); outer "
            "range semantics need unmatched-row re-attachment"
        )
    w = 2.0 * float(epsilon)
    b0 = F.floor(F.col(l_val) / w)
    lower_half = (F.col(l_val) - b0.cast("double") * w) < epsilon
    neighbor = F.when(lower_half, b0 - 1).otherwise(b0 + 1)
    lb = left.withColumn("__b", F.explode(F.array(b0, neighbor)))
    rb = right.withColumn("__b", F.floor(F.col(r_val) / w))
    return (
        lb.join(rb, on="__b", how=how)
        .drop("__b")
        .filter(F.abs(F.col(l_val) - F.col(r_val)) < epsilon)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right_ts <= left_ts`` on the same key (direction='backward'),
    or the EARLIEST right row with ``right_ts >= left_ts``
    (direction='forward' — the "next reading after the query point"
    form).

    Spark has no native ASOF JOIN (DuckDB/pandas do); the idiomatic
    distributed form is union-tag + one ranking-window sweep:
    interleave both sides sorted by (key, ts), then carry the last
    seen right-side values forward with last_value(ignorenulls).
    Forward is the same sweep over the REVERSED time order (sort ts
    descending) — still one shuffle, no second pass. ONE shuffle on
    the key — no per-row range probe, no cross product; this is the
    100 TB shape (a merge_asof per group via applyInPandas would
    move all data through Python instead).

    Ties (right_ts == left_ts) take the right row in both
    directions, matching DuckDB ASOF JOIN's >= / <= semantics.

    The right-side payload is carried as ONE struct, not per-column
    last(ignorenulls) sweeps: per-column carries could stitch values
    from DIFFERENT right rows whenever a matched row holds NULL in
    one of ``right_vals`` (the nearest row's NULL field would be
    back-filled from an older row) — DuckDB/pandas ASOF match a ROW,
    so a matched row's NULL fields must stay NULL. The struct itself
    is non-null for every right row, so last(ignorenulls) selects
    whole rows.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = [c for c in left.columns]
    r_struct = F.struct(*[F.col(v) for v in right_vals])
    r_type = right.select(r_struct.alias("__r")).schema["__r"].dataType
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # right rows sort first on ts ties
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            l_tag.schema["__l"].dataType
        ).alias("__l"),
        r_struct.alias("__r"),
    )
    merged = l_tag.unionByName(r_tag)
    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "__k",
        "__side",
        "__l",
        F.last("__r", ignorenulls=True).over(w).alias("__rv"),
    )
    out = carried.filter(F.col("__side") == 1).select(
        F.col("__l.*"),
        *[F.col(f"__rv.{v}").alias(v) for v in right_vals],
    )
    return out


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """J3 — hash/broadcast/sort-merge equi join; Catalyst+AQE pick the
    physical strategy, ``broadcast_right`` forces the hint for known
    small dims (SURVEY.md §4.2)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Interval overlap join — pairs where [l_start, l_end) and
    [r_start, r_end) intersect — via time-grid bucketing, so the
    physical plan is a HASH equi-join on the bucket id, never a
    nested-loop theta join.

    Every interval emits one row per ``bucket_seconds``-wide grid
    cell it touches (``sequence(floor(s/u), floor(e/u))`` + explode);
    overlapping intervals necessarily share at least one cell. A
    pair touching several shared cells would duplicate, so exactly
    one cell CLAIMS each pair: the cell containing the overlap's
    start, ``floor(max(l_start, r_start)/u)``.

    Replication factor is interval_length/bucket_seconds + 1 — pick
    the bucket near the typical interval length. Cost is linear in
    rows x replication; AQE splits hot cells (e.g. a maintenance
    window every interval overlaps). This is the 100 TB shape for
    "which sessions overlap which incident windows".
    """
    u = int(bucket_seconds)

    def cells(df: DataFrame, s: str, e: str) -> DataFrame:
        lo = F.floor(F.unix_timestamp(F.col(s)) / u)
        hi = F.floor(F.unix_timestamp(F.col(e)) / u)
        return df.withColumn("__cell", F.explode(F.sequence(lo, hi)))

    lc = cells(left, l_start, l_end)
    rc = cells(right, r_start, r_end)
    claim = F.floor(
        F.greatest(
            F.unix_timestamp(F.col(l_start)), F.unix_timestamp(F.col(r_start))
        )
        / u
    )
    return (
        lc.join(rc, "__cell")
        .filter(
            (F.col(l_start) < F.col(r_end))
            & (F.col(r_start) < F.col(l_end))
            & (F.col("__cell") == claim)
        )
        .drop("__cell")
    )


def bloom_prefilter(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1 << 17,
    n_hashes: int = 3,
) -> DataFrame:
    """J7 — Bloom-filter semi-join pruning: drop fact rows whose key
    cannot exist in ``dim`` BEFORE the join shuffle.

    The scale case broadcast-hash-join doesn't cover: ``dim`` is too
    large to broadcast as rows, but its Bloom bitmap (n_bits/8 bytes
    — 16 KB here, 16 MB for a billion-key dim at 1% FP) still fits.
    Spark's own runtime row-level filtering does this automatically
    only for shuffle-hash/broadcast plans with statistics; this is
    the explicit, always-available form.

    Build: k=``n_hashes`` positions per dim key (xxhash64 seeded per
    hash), packed into (word_idx, 64-bit word) pairs via a bit_or
    aggregation — the bitmap never exists as one row until the final
    vocabulary-sized collect into a plan-literal MAP. Probe: k map
    lookups + bit tests per fact row, whole-stage-codegen JVM
    expressions, no shuffle, no Python.

    No false negatives (every true match survives — the downstream
    join stays exact); false positives only waste shuffle, removed by
    the join itself.
    """
    words = None
    for i in range(n_hashes):
        pos = F.pmod(F.xxhash64(F.col(dim_key), F.lit(i)), F.lit(n_bits))
        # F.shiftleft only takes a Python-int numBits — go through the
        # SQL function, which accepts a column shift amount
        w = dim.select(pos.alias("__pos")).select(
            F.expr("CAST(floor(__pos / 64) AS BIGINT)").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        words = w if words is None else words.unionByName(w)
    bitmap = (
        words.groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
        .select(
            F.map_from_entries(
                F.collect_list(F.struct("word_idx", "word"))
            ).alias("bm")
        )
    )
    probe = None
    for i in range(n_hashes):
        pos_sql = f"pmod(xxhash64(`{fact_key}`, {i}), {n_bits})"
        hit = F.expr(
            f"(element_at(bm, CAST(floor({pos_sql} / 64) AS BIGINT)) "
            f"& shiftleft(CAST(1 AS BIGINT), CAST({pos_sql} % 64 AS INT))) "
            "!= 0"
        )
        probe = hit if probe is None else (probe & hit)
    return fact.join(F.broadcast(bitmap)).filter(probe).drop("bm")


def bloom_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1 << 17,
    n_hashes: int = 3,
) -> DataFrame:
    """Bloom-prefiltered inner equi-join: prune the fact side with
    :func:`bloom_prefilter`, then join — identical result to the
    plain join (the Bloom pass has no false negatives), with the
    fact-side shuffle shrunk to matching-plus-FP rows. The shape for
    a selective dim too big to broadcast."""
    pruned = bloom_prefilter(fact, dim, fact_key, dim_key, n_bits, n_hashes)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
    tolerance_seconds: float,
    direction: str = "backward",
) -> DataFrame:
    """As-of join with a MATCH TOLERANCE (pandas ``merge_asof``'s
    ``tolerance=``): the nearest-in-direction match is kept only if
    it lies within ``tolerance_seconds`` of the left timestamp;
    stale matches become NULLs, exactly like an unmatched left row.
    The sensor/feature-store contract — "the latest reading, but
    never one older than N minutes" — that a plain as-of join can't
    express.

    Composition, not reimplementation: run :func:`asof_join` (which
    already carries the matched right timestamp when asked), then
    NULL the payload where the gap exceeds the tolerance — a
    row-local codegen CASE, no extra shuffle. ``right_ts`` must not
    collide with a left column name (same contract as asof_join's
    right_vals). Timestamp/numeric agnostic: both cast to double
    seconds."""
    matched = asof_join(
        left, right, on, left_ts, right_ts,
        [*right_vals, right_ts], direction,
    )
    gap = F.col(left_ts).cast("double") - F.col(right_ts).cast("double")
    if direction == "forward":
        gap = -gap
    within = gap <= F.lit(float(tolerance_seconds))
    keep = [c for c in matched.columns if c not in (*right_vals, right_ts)]
    return matched.select(
        *keep,
        *[
            F.when(within, F.col(v)).otherwise(F.lit(None)).alias(v)
            for v in (*right_vals, right_ts)
        ],
    )
