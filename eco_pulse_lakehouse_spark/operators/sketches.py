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


# --- Space-Saving top-k (mergeable summaries) -----------------------------


def spacesaving_summary(
    df: DataFrame,
    key_col: str,
    unit_col: str,
    k: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-UNIT Space-Saving summary (Metwally et al. 2005, in the
    mergeable-summaries formulation of Agarwal et al. 2012): for each
    unit (a day, a file batch, a deterministic shard), the top-``k``
    keys by exact in-unit count plus the unit's TRUNCATION THRESHOLD
    — the largest dropped count (0 when nothing was dropped). A key
    absent from a unit's summary is guaranteed to have in-unit count
    ≤ thr, which is exactly the invariant the merge needs.

    Returns (unit, key, cnt, thr) — ≤ k rows per unit, thr constant
    within a unit. Counts are EXACT per key (groupBy map-side
    combine), so tracked keys carry zero error — the classic
    streaming SS trades that exactness for strict O(k) scan state;
    the CMS+recount pipeline (t17/t26) covers that regime. Here the
    bounded thing is the MERGE INPUT: O(k · #units) rows instead of
    Σ|vocab_unit|. Determinism: ties rank by (cnt desc, key asc) —
    no dependence on row order anywhere. At 100 TB, if a single
    unit's vocabulary is itself too hot for one rank partition,
    sub-shard the unit by key hash first — keys are disjoint across
    sub-shards, so the union of sub-shard top-k contains the unit
    top-k."""
    from pyspark.sql import Window

    w = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    counts = df.groupBy(unit_col, key_col).agg(F.sum(w).alias("cnt"))
    rank_w = Window.partitionBy(unit_col).orderBy(
        F.col("cnt").desc(), F.col(key_col).asc()
    )
    ranked = counts.withColumn("__rn", F.row_number().over(rank_w))
    kept = ranked.filter(F.col("__rn") <= k).drop("__rn")
    thr = (
        ranked.filter(F.col("__rn") > k)
        .groupBy(unit_col)
        .agg(F.max("cnt").alias("thr"))
    )
    return (
        kept.join(thr, unit_col, "left")
        .withColumn("thr", F.coalesce("thr", F.lit(0).cast("bigint")))
        .select(unit_col, key_col, "cnt", "thr")
    )


def spacesaving_merge(
    summaries: DataFrame, key_col: str, unit_col: str = "unit"
) -> DataFrame:
    """ORDER-INSENSITIVE merge of per-unit summaries into global
    count BOUNDS per key: ``lower = Σ_units tracked cnt`` (exact
    mass seen in tracking units) and ``upper = lower + Σ_{units NOT
    tracking the key} thr_unit`` (each non-tracking unit can hide at
    most its threshold). Both are plain commutative-associative sums
    over the summary rows — merging day summaries in ANY order, or
    unioning partial merges, yields the SAME bounds (pinned in
    pytest by merging a permuted union). The summary table is
    O(k · #units) rows, so the merge shuffles almost nothing.

    Implementation note: ``upper`` is computed as
    ``lower + (T_total − Σ_{tracking units} thr)`` with T_total the
    sum of ALL unit thresholds — one tiny distinct-aggregate
    broadcast — so no per-key anti-join against the unit list is
    needed."""
    totals = (
        summaries.select(unit_col, "thr")
        .distinct()
        .agg(F.sum("thr").cast("bigint").alias("__t_total"))
    )
    return (
        summaries.groupBy(key_col)
        .agg(
            F.sum("cnt").cast("bigint").alias("lower"),
            F.sum("thr").cast("bigint").alias("__covered"),
        )
        .join(F.broadcast(totals))
        .select(
            key_col,
            "lower",
            (F.col("lower") + F.col("__t_total") - F.col("__covered"))
            .cast("bigint")
            .alias("upper"),
        )
    )


def spacesaving_topk(
    df: DataFrame,
    key_col: str,
    unit_col: str,
    k: int,
    per_unit_k: int | None = None,
    weight_col: str | None = None,
    out_count: str = "n",
    strict: bool = True,
) -> DataFrame:
    """EXACT global top-``k`` keys by count via mergeable Space-Saving
    summaries + exact recount — the a29 pattern (sketch prunes, exact
    pass certifies) for the top-k-by-frequency question instead of
    the threshold question.

    1. summarize each unit to its top-``per_unit_k`` (default 4k —
       slack cuts recount candidates' upper bounds);
    2. merge order-insensitively into per-key (lower, upper) bounds;
    3. prune: L_k := the k-th largest lower bound; any key with
       upper < L_k cannot be in the true top-k (true ≤ upper <
       L_k ≤ k true counts). Every true top-k key survives: its
       exact count ≥ the k-th exact count ≥ L_k, and upper ≥ exact.
    4. exact recount of the surviving candidate keys only (semi-join
       prefilter BEFORE the groupBy exchange, exactly like
       frequent_items), then top-k by (count desc, key asc).

    Output is IDENTICAL to the direct GROUP BY / ORDER BY / LIMIT k
    — the corpus oracle (a30_spacesaving) is that plain SQL. At
    100 TB the groupBy exchange sees |candidates| ≈ O(k · #units)
    keys instead of the full vocabulary — for n-gram streams the
    difference between a bounded exchange and a combinatorial one.
    NULL keys are excluded (as in frequent_items); a direct GROUP BY
    would report the NULL group.

    EXACTNESS CERTIFICATE: a key tracked by NO unit never enters the
    merge, and its count can still reach T_total (every unit hides up
    to its threshold) — the classic diffuse-key hazard of merged SS
    summaries. The output is certifiably exact iff ``T_total == 0``
    (no unit truncated anything — merge exact and complete) or
    ``L_k > T_total``.
    With ``strict=True`` (default) that certificate is ASSERTED in
    the plan (``assert_true`` on the broadcast scalars — the job
    fails loudly instead of silently returning a plausible top-k;
    raise ``per_unit_k`` until it holds). ``strict=False`` skips the
    check for exploratory use."""
    pk = per_unit_k if per_unit_k is not None else 4 * k
    summaries = spacesaving_summary(
        df, key_col, unit_col, pk, weight_col=weight_col
    )
    merged = spacesaving_merge(summaries, key_col, unit_col)
    # L_k: k-th largest lower bound — a k-row sort on the tiny merged
    # summary table, broadcast back as a one-row threshold
    lk = (
        merged.select("lower")
        .orderBy(F.col("lower").desc())
        .limit(k)
        .agg(F.min("lower").cast("bigint").alias("__lk"))
    )
    t_total = (
        summaries.select(unit_col, "thr")
        .distinct()
        .agg(F.sum("thr").cast("bigint").alias("__t_total"))
    )
    cert = lk.join(t_total)
    candidates = (
        merged.join(F.broadcast(cert))
        .filter(F.col("upper") >= F.col("__lk"))
    )
    if strict:
        # T_total == 0 means no unit truncated anything: the merge is
        # exact AND complete (no untracked key exists), so the output
        # is exact even when L_k can't exceed T_total — e.g. a tiny
        # key vocabulary where every key fits in every unit's summary.
        # (Candidate-set == merged-set is NOT a valid certificate: an
        # untracked-everywhere key can still total up to T_total.)
        candidates = candidates.filter(
            F.assert_true(
                (F.col("__t_total") == F.lit(0))
                | (F.col("__lk") > F.col("__t_total")),
                F.lit(
                    "space-saving top-k not certifiably exact "
                    "(L_k <= T_total): a key below every unit's "
                    "threshold could still be top-k — raise per_unit_k"
                ),
            ).isNull()
        )
    candidates = candidates.select(key_col)
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    return (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.sum(w).alias(out_count))
        .orderBy(F.col(out_count).desc(), F.col(key_col).asc())
        .limit(k)
    )


# --- AMS F2 (second frequency moment / self-join size) ---------------------

AMS_HASH_A = 2_654_435_761  # Knuth multiplicative constant (CMS family)
AMS_HASH_STEP = 99_991      # odd prime step decorrelates the sketches


def ams_sign(h: Column, j: int, mod: int = TOKEN_HASH_MOD) -> Column:
    """±1 sign of pre-hashed key ``h`` under sketch ``j``: the parity
    of the affine multiplicative hash ``(h·(A + j·STEP)) mod P``
    (P odd prime ⇒ parities near-balanced). h < P ≈ 1e6 and
    A + 15·STEP < 2^32 keep the product < 2^52 — exact BIGINT.
    Like the CMS depth family, the affine family is not formally
    4-wise independent (which the AMS variance bound assumes); swap
    in a universal family for the guarantee — plan shape unchanged."""
    a = F.lit(int(AMS_HASH_A + j * AMS_HASH_STEP))
    return (
        F.lit(1)
        - F.lit(2) * F.pmod(F.pmod(h * a, F.lit(mod)), F.lit(2))
    ).cast("bigint")


def ams_f2_estimates(
    df: DataFrame,
    key: Column,
    n_sketches: int = 16,
    mod: int = TOKEN_HASH_MOD,
) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon, Matias & Szegedy,
    STOC 1996): F2 = Σ_k f_k² — the SELF-JOIN SIZE of the key column,
    the quantity a join planner estimates before picking a strategy,
    and the tail-heaviness moment between F0 (distinct count — the
    HLL rollup) and F∞ (heavy hitters — spacesaving). Each sketch is
    one ±1-signed counter ``S_j = Σ_rows s_j(key)`` with
    E[S_j²] = F2 exactly; averaging over sketches concentrates it.

    Spark-first shape: all ``n_sketches`` counters are plain SUM
    aggregates in ONE narrow pass (map-side combinable to one row
    per task — the same maintenance shape as the CMS/HLL rollups),
    then `stack` unpivots the single row. Sketches are LINEAR:
    per-partition/per-day sketch vectors merge by plain addition
    and merged == direct exactly (pinned) — the mergeable-summary
    contract that lets 100 TB maintain per-shard sketches and
    estimate any union's self-join size without rescans. S_j ≤ N
    so est = S_j² needs N < 2^31 per merged scope; shard the scope
    (and merge) past that. Returns (j, sketch, est_f2)."""
    h = F.pmod(key.cast("bigint"), F.lit(mod))
    agg = df.agg(
        *[
            F.sum(ams_sign(h, j, mod)).cast("bigint").alias(f"__s{j}")
            for j in range(n_sketches)
        ]
    )
    stacked = agg.selectExpr(
        f"stack({n_sketches}, "
        + ", ".join(f"{j}, __s{j}" for j in range(n_sketches))
        + ") as (j, sketch)"
    )
    return stacked.select(
        F.col("j").cast("int").alias("j"),
        F.col("sketch"),
        (F.col("sketch") * F.col("sketch")).cast("bigint").alias("est_f2"),
    )
