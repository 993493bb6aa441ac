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


def cms_literal_map(sketch: DataFrame) -> DataFrame:
    """Collapse a (d, bucket, c) sketch into a ONE-ROW DataFrame whose
    single column ``__cms`` is a ``map<bigint,bigint>`` keyed by
    ``d * 2^32 + bucket``. Broadcast-joined onto a probe side, every
    lookup is a codegen ``element_at`` — the same plan-literal-map
    shape as the Bloom bitmap in operators/joins.py:bloom_prefilter,
    and like it the map never exists as driver-side Python state."""
    return sketch.select(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    (
                        F.col("d").cast("bigint") * F.lit(1 << 32)
                        + F.col("bucket")
                    ).alias("key"),
                    F.col("c").alias("value"),
                )
            )
        ).alias("__cms")
    )


def cms_rowwise_estimate(
    key: Column, depth: int, width: int, map_col: str = "__cms"
) -> Column:
    """Per-ROW CMS point estimate against a broadcast ``__cms``
    literal map: min over the depth bucket lookups, entirely inside
    whole-stage codegen — no shuffle, no per-key aggregation. The
    zero-frequency case (bucket no row ever hit) reads as 0."""
    h = token_char_hash(key)
    ests = [
        F.coalesce(
            F.element_at(
                F.col(map_col),
                F.lit(d).cast("bigint") * F.lit(1 << 32)
                + cms_bucket(h, F.lit(d), width).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
        )
        for d in range(depth)
    ]
    return F.least(*ests) if depth > 1 else ests[0]


def frequent_items(
    df: DataFrame,
    key_col: str,
    min_count: int,
    depth: int = 4,
    width: int = 1 << 12,
    out_count: str = "n",
) -> DataFrame:
    """EXACT heavy hitters (keys with frequency >= ``min_count``) via
    a Count-Min candidate pass — the space-saving/top-k family's
    scale shape with a hard-oracle-able output.

    Why two passes: a direct ``GROUP BY key HAVING count >= T`` must
    shuffle the ENTIRE vocabulary — for n-gram mining the vocabulary
    is orders of magnitude larger than the row count's distinct-key
    working set that actually matters. Pass 1 builds a CMS (shuffle
    is O(depth x width) cells, constant); pass 2 re-scans, estimates
    each row's OWN key map-side against the broadcast sketch, and
    drops rows whose estimate is below ``min_count`` BEFORE the
    groupBy shuffle — so only candidate keys (true heavy hitters
    plus bounded collision false-positives) ever enter the exchange,
    and partial aggregation sees |candidates| distinct keys instead
    of |vocabulary|.

    Exactness: CMS never undercounts, so every true heavy hitter
    survives the prefilter (no false negatives); the final exact
    count + HAVING removes collision false-positives. Output is
    therefore IDENTICAL to the direct query — the corpus oracle
    (a29_heavy_hitters) is plain GROUP BY/HAVING SQL, no sketch
    replay needed. Widen ``width`` to cut wasted shuffle (false
    positives ~ vocab/width per cell), never for correctness.
    NULL keys are EXCLUDED (the char hash of NULL is NULL, so NULL
    rows never survive the prefilter) — unlike a direct GROUP BY,
    which reports the NULL group; filter or fill NULLs upstream if
    that group matters."""
    sketch = cms_build(df, key_col, depth=depth, width=width)
    est = cms_rowwise_estimate(F.col(key_col), depth, width)
    candidates = (
        df.join(F.broadcast(cms_literal_map(sketch)))
        .filter(est >= F.lit(min_count))
        .drop("__cms")
    )
    return (
        candidates.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias(out_count))
        .filter(F.col(out_count) >= F.lit(min_count))
    )


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
