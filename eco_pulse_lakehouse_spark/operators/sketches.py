"""Mergeable frequency sketches — Count-Min as a DataFrame.

A Count-Min sketch (Cormode & Muthukrishnan 2005) summarizes a
frequency distribution in a depth x width counter table: every key
increments one bucket per row (depth hash functions), and a point
query reads the MINIMUM of its depth buckets — never an undercount,
overcount bounded by collisions (~N/width per row in expectation).

Spark-first shape: the sketch IS a tiny (d, bucket, c) DataFrame.
  build  — one narrow pass over the data; the groupBy collapses to at
           most depth*width rows with map-side partial aggregation, so
           the shuffle is O(depth*width) per task regardless of input
           size (the same maintenance shape as the HLL rollup in
           a17_hll_mergeable: sketch partitions once, merge cheaply).
  merge  — sketches are linear: union + groupBy-sum. Daily sketches
           roll up to any window without rescanning history, and
           merge-then-query == build-once-then-query EXACTLY (pinned
           in pytest).
  query  — broadcast the sketch (a few KB) onto the candidate keys;
           min over depth lookups.

All hashing is exact BIGINT arithmetic over the char-polynomial
token hash (functions/text.py:token_char_hash) with fixed public
multiplicative constants (Knuth 2654435761), so the full sketch —
build, merge, estimate — is bit-identical in any engine; corpus
a19_countmin replays it end-to-end in DuckDB SQL. The affine
per-depth family is NOT formally pairwise independent; for the
error-bound *guarantee* swap in a universal family — the plan shape
is unchanged.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.functions.text import (
    TOKEN_HASH_MOD,
    token_char_hash,
)

CMS_HASH_A = 2_654_435_761  # Knuth multiplicative constant
CMS_HASH_STEP = 40_503      # odd step decorrelates the depth rows


def cms_bucket(h: Column, d: Column, width: int) -> Column:
    """Bucket of pre-hashed key ``h`` under depth-``d``'s function:
    ``((h * (A + d*STEP)) % P) % width`` — h < P ≈ 1e6 and
    A + 3*STEP < 2^32 keep the product < 2^52, exact in BIGINT."""
    a = F.lit(CMS_HASH_A) + d.cast("bigint") * F.lit(CMS_HASH_STEP)
    return (h * a % F.lit(TOKEN_HASH_MOD) % F.lit(width)).cast("int")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """Sketch the frequency of string keys: one (d, bucket) increment
    per row per depth (or ``weight_col`` units for weighted
    frequencies — byte counts, token counts; weights must be
    integral for the sketch to stay exact). The key is hashed ONCE
    per row; the per-depth buckets are a tiny transform over that
    hash. Returns (d, bucket, c) — at most depth*width rows."""
    h = token_char_hash(F.col(key_col))
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    pairs = F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda d: F.struct(
            d.cast("int").alias("d"),
            cms_bucket(F.col("__h"), d, width).alias("bucket"),
        ),
    )
    return (
        df.select(h.alias("__h"), w.alias("__w"))
        .select(F.explode(pairs).alias("p"), "__w")
        .groupBy(F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
        .agg(F.sum("__w").alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sum counter tables cell-wise (sketches are linear)."""
    unioned = reduce(lambda a, b: a.unionByName(b), sketches)
    return unioned.groupBy("d", "bucket").agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    out_col: str = "est_count",
) -> DataFrame:
    """Point-query a batch of keys: min over the depth buckets.
    The sketch broadcasts (≤ depth*width rows); keys never shuffle
    except the final per-key min — which is a partial aggregation
    over exactly ``depth`` rows per key. A bucket no row ever hit
    reads as 0 (left join + coalesce)."""
    h = token_char_hash(F.col(key_col))
    probes = keys.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    ).withColumn("bucket", cms_bucket(h, F.col("d"), width))
    others = [c for c in keys.columns]
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        .groupBy(*others)
        .agg(F.min("c").alias(out_col))
    )
