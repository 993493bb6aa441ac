"""Vector (embedding) column expressions — north-star X3.

Embeddings are plain ``array<float>`` columns. All math is built-in
higher-order functions (zip_with fold / aggregate) evaluated in
DOUBLE: JVM-side, no UDF, deterministic left-to-right fold that
matches DuckDB's list kernels bit-for-bit at the same association.

At 100 TB the brute-force forms below are the *refine* stage; the
*candidate* stage is LSH bucketing (operators/similarity.py) so the
cross product never materializes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, sequential fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot/(‖a‖·‖b‖) — shaped as dot / (sqrt * sqrt) to match the
    DuckDB ``list_cosine_similarity`` evaluation order."""
    return dot(a, b) / (norm2(a) * norm2(b))
