"""File-layout optimization — Z-order clustering (data skipping).

Parquet/Delta readers prune FILES by per-file min/max statistics.
Range-partitioning by a single column gives tight stats on that
column only; Z-ordering interleaves the bits of two dimensions so
files cover compact rectangles in (x, y) space — point/range
predicates on EITHER dimension then skip most files (Delta's
``OPTIMIZE ZORDER BY``, expressed at the engine level; see
SCALE.md "Scans & layout").

The z-value is pure integer bit arithmetic (no UDF, codegen'd), and
``tests/test_pipeline_ops.py`` measures the skipping effect
directly: summed per-file bounding-box area shrinks by an order of
magnitude vs hash layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 10  # 2 dims × 10 bits = 20-bit z-values


def z_value(x: Column, y: Column, bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    z = Σ_i ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1). A flat tree of
    2·bits shift/mask terms — whole-stage-codegen folds it into one
    projection."""
    x = x.cast("bigint")
    y = y.cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def z_value_sql(x_expr: str, y_expr: str, bits: int = DEFAULT_BITS) -> str:
    """The identical expression in ANSI SQL (DuckDB oracle twin)."""
    # every term fully parenthesized: DuckDB gives <<, & and | equal
    # left-associative precedence, so a bare `t << 2 | u << 3` chain
    # re-shifts the accumulated value and overflows
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def hilbert_values(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = DEFAULT_BITS,
    out_col: str = "h",
) -> DataFrame:
    """Hilbert-curve distance of (x, y) — the continuity-superior
    alternative to :func:`z_value` (Iceberg ships both as OPTIMIZE
    clustering choices): consecutive Hilbert values are ALWAYS grid
    neighbors (Manhattan distance 1 — pytest-pinned on a full grid),
    where the Z-curve jumps across the plane at every quadrant
    boundary. Honest trade-off, measured: per-file min/max BOUNDING
    BOXES are comparable, not better (Z's contiguous ranges are
    exact dyadic rectangles; Hilbert's connected segments can bend
    into L-shapes) — Hilbert's win is fewer curve discontinuities
    per query rectangle, i.e. fewer file-range fragments per range
    scan, which matters when readers seek contiguous runs.

    The standard iterative xy→d transform (quadrant digit + rotate,
    one step per bit) is a RECURRENCE in (x, y); inlining it as one
    column expression would duplicate the CASE branches ~4× per
    level (4^bits nodes), so each step is its own projection over
    NAMED intermediates — ``bits`` chained selects, all integer CASE
    arithmetic, no UDF; the oracle mirrors them as chained CTEs (the
    unrolled-CTE discipline). Appends ``out_col``; input columns must
    be non-negative and < 2^bits."""
    keep = df.columns
    cur = df.withColumn("__hx", x.cast("bigint")).withColumn(
        "__hy", y.cast("bigint")
    ).withColumn("__hd", F.lit(0).cast("bigint"))
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        hx, hy = F.col("__hx"), F.col("__hy")
        rx = F.shiftright(hx, i).bitwiseAND(F.lit(1))
        ry = F.shiftright(hy, i).bitwiseAND(F.lit(1))
        # quadrant digit (3*rx) xor ry spelled as a portable CASE
        quad = (
            F.when((rx == 0) & (ry == 0), 0)
            .when(rx == 0, 1)
            .when(ry == 1, 2)
            .otherwise(3)
        )
        new_hd = F.col("__hd") + F.lit(s * s).cast("bigint") * quad
        flip_x = F.when(rx == 1, F.lit(s - 1) - hy).otherwise(hy)
        flip_y = F.when(rx == 1, F.lit(s - 1) - hx).otherwise(hx)
        new_hx = F.when(ry == 1, hx).otherwise(flip_x)
        new_hy = F.when(ry == 1, hy).otherwise(flip_y)
        cur = cur.select(
            *keep,
            new_hx.alias("__hx"),
            new_hy.alias("__hy"),
            new_hd.alias("__hd"),
        )
    return cur.select(*keep, F.col("__hd").alias(out_col))


def hilbert_sql(
    source_sql: str,
    key_cols: str,
    x_expr: str,
    y_expr: str,
    bits: int = DEFAULT_BITS,
    out_col: str = "h",
) -> str:
    """The identical unrolled transform as chained DuckDB CTEs (one
    per bit — same named-intermediate shape as the Spark side)."""
    ctes = [
        f"h{bits} AS (SELECT {key_cols}, CAST({x_expr} AS BIGINT) AS hx,"
        f" CAST({y_expr} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd"
        f" FROM {source_sql})"
    ]
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = f"((hx >> {i}) & 1)"
        ry = f"((hy >> {i}) & 1)"
        quad = (
            f"CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0"
            f" WHEN {rx} = 0 THEN 1 WHEN {ry} = 1 THEN 2 ELSE 3 END"
        )
        flip_x = f"CASE WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END"
        flip_y = f"CASE WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END"
        ctes.append(
            f"h{i} AS (SELECT {key_cols},"
            f" CASE WHEN {ry} = 1 THEN hx ELSE {flip_x} END AS hx,"
            f" CASE WHEN {ry} = 1 THEN hy ELSE {flip_y} END AS hy,"
            f" hd + {s * s} * ({quad}) AS hd FROM h{i + 1})"
        )
    joined = ",\n    ".join(ctes)
    return (
        f"WITH {joined}\n"
        f"    SELECT {key_cols}, hd AS {out_col} FROM h0"
    )


def hilbert_layout(
    df: DataFrame,
    x: Column,
    y: Column,
    num_files: int,
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """:func:`zorder_layout` along the Hilbert curve — same single
    range shuffle; file boxes in the Z-order class, segments never
    discontiguous (see :func:`hilbert_values` for the trade-off)."""
    return (
        hilbert_values(df, x, y, bits, out_col="__h")
        .repartitionByRange(num_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
    )


def zorder_layout(
    df: DataFrame,
    x: Column,
    y: Column,
    num_files: int,
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """Cluster rows into ``num_files`` output splits along the
    Z-curve: range-partition on the z-value, sort within each split.
    One range shuffle (same cost class as any repartition); the
    payoff is every later scan with an (x, y) predicate skipping
    most files via min/max stats."""
    return (
        df.withColumn("__z", z_value(x, y, bits))
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
