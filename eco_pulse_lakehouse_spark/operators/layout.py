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
