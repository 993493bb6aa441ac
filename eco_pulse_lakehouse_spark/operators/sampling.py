"""Deterministic sampling & split assignment — training-pipeline ops.

A 100 TB curation run can't use ``df.sample`` for train/val/test
splits: Spark's sampler is seeded per-partition, so the assignment of
a ROW changes whenever partitioning changes (repartition, AQE, scale
factor), and reruns aren't reproducible across layouts. The
production-safe form hashes a STABLE ID into a unit interval and
thresholds it — assignment is a pure function of the row, independent
of partitioning, cluster size, and execution order.

The hash here is Knuth's multiplicative congruential step
(id · 2654435761 mod 2³²) — plain BIGINT arithmetic, so the DuckDB
oracle reproduces it exactly (unlike xxhash64, which DuckDB lacks).
For adversarial id distributions compose with ``F.xxhash64`` first;
for the oracle-checked corpus the arithmetic form is the point.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 / golden ratio, Knuth multiplicative hash
# Alternate odd multipliers (xxhash32's public primes) for pipelines
# that need SEVERAL independent-looking draws per id. Additive
# "salting" of ONE multiplicative hash does NOT work:
# unit_hash(id + c) = frac(unit_hash(id) + c·K/2³²) is a pure rotation
# of the same draw, so chained selections stay perfectly correlated
# (the round-3 advisor bug in plans/training_export.py). A different
# odd multiplier per stage gives a genuinely different permutation.
MULT_B = 2246822519  # xxhash32 PRIME2
MULT_C = 3266489917  # xxhash32 PRIME3
M32 = 1 << 32


def unit_hash(id_col: Column, mult: int = KNUTH) -> Column:
    """Deterministic uniform-ish value in [0, 1) from an integer id.

    ``mult`` must be odd (bijective mod 2³²); pass a distinct
    multiplier (``MULT_B``/``MULT_C``) per stage when one pipeline
    thresholds the hash more than once — see note above.
    """
    return (
        F.pmod(id_col.cast("bigint") * F.lit(int(mult)), F.lit(M32))
        / F.lit(M32)
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: Sequence[tuple[str, float]] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
) -> DataFrame:
    """Assign every row to a named split by thresholding the unit
    hash: cumulative fraction boundaries partition [0, 1). Adds a
    ``split`` column; fractions must sum to 1."""
    total = sum(f for _, f in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    u = unit_hash(F.col(id_col))
    expr = None
    cum = 0.0
    for name, frac in splits[:-1]:
        cum += frac
        cond = u < F.lit(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(splits[-1][0]) if expr is None else expr.otherwise(splits[-1][0])
    )
    return df.withColumn("split", expr)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen purely by id hash — the
    same rows survive under any partitioning, cluster size, or rerun
    (``df.sample`` guarantees none of these)."""
    return df.filter(unit_hash(F.col(id_col)) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    class_col: str,
    id_col: str,
    n_per_class: int,
) -> DataFrame:
    """Deterministic per-class cap: keep the ``n_per_class`` rows with
    the smallest unit-hash inside every class (ties broken by id).

    The balanced-corpus op (cap each source/domain/language at N docs)
    phrased as one ranking window per class — a single shuffle on the
    class key, no driver-side class enumeration, and the SAME rows
    survive under any partitioning or cluster size because rank order
    is a pure function of the row. For classes with heavy skew the
    window sort is per-class (each reducer sorts only its classes);
    at 100 TB a two-phase refinement (per-partition top-N, then
    global top-N per class) drops the sort to O(partition · N) — the
    rank operator in operators/rank.py implements that shape.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(class_col).orderBy(
        unit_hash(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_class)
        .drop("__rn")
    )


def priority_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Weight-proportional sample of ``k`` rows WITHOUT replacement —
    priority sampling (Duffield–Lund–Thorup): each row gets priority
    ``u / w`` with ``u`` the deterministic unit hash of its id, and
    the k smallest priorities win (heavier rows draw smaller
    priorities, so inclusion probability scales with weight; with τ
    the (k+1)-th smallest priority, the unbiased subset-sum
    estimator for a sampled row is ŵ = max(w, 1/τ) if callers
    need it).

    Chosen over Efraimidis–Spiridakis keys (u^(1/w)) deliberately:
    the priority is ONE IEEE division of reproducible values — no
    pow/exp, so the sample is bit-identical across engines, reruns,
    and partitionings. The top-k is orderBy+limit →
    TakeOrderedAndProject: per-partition heaps then a k-row merge,
    never a global sort.
    """
    pri = unit_hash(F.col(id_col)) / F.col(weight_col)
    return (
        df.withColumn("priority", pri)
        .orderBy(F.col("priority").asc(), F.col(id_col).asc())
        .limit(k)
    )


def domain_mixture_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weights: dict[str, float],
    k: int,
) -> DataFrame:
    """Rebalance a corpus toward a target domain mixture (the
    Pile-style data-recipe op): draw ≈``k`` rows with expected
    per-domain share ``weights[d]``, by thresholding the unit hash at
    ``min(1, k·w_d / n_d)`` per domain. Over-represented domains are
    downsampled toward their target share; a domain whose target
    exceeds its population keeps every row (fraction capped at 1 —
    upsampling/repetition is x7's packing concern, not sampling's).

    One vocabulary-sized count aggregation, broadcast back with the
    weight table; selection is then a pure row-local predicate —
    deterministic under any partitioning, layout, or retry, and
    exactly reproducible by the SQL oracle (Knuth-hash arithmetic,
    no RNG)."""
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    w = df.sparkSession.createDataFrame(
        list(weights.items()), f"{domain_col} string, __wt double"
    )
    frac = F.least(
        F.lit(1.0),
        F.lit(float(k)) * F.col("__wt") / F.col("__n").cast("double"),
    )
    return (
        df.join(F.broadcast(counts), domain_col)
        .join(F.broadcast(w), domain_col)
        .filter(unit_hash(F.col(id_col)) < frac)
        .drop("__n", "__wt")
    )


def group_aware_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    splits: Sequence[tuple[str, float]] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
) -> DataFrame:
    """Leakage-free train/val/test assignment: split by NEAR-DUP
    CLUSTER, not by document. Plain hash_split leaks — two near-
    duplicates can land in train and test, inflating eval (the
    contamination connected-components dedup exists to prevent).
    Here every doc inherits its cluster id (min reachable id via
    connected_components; singletons keep their own id) and the
    Knuth unit hash thresholds THAT, so a whole cluster moves
    together by construction.

    Shape: pairs → iterative min-label propagation (bounded rounds,
    equi-joins only) → one broadcast-or-hash join back onto docs →
    the same plan-constant hash CASE as hash_split. Adds
    ``group_id`` and ``split``."""
    from eco_pulse_lakehouse_spark.operators.components import (
        connected_components,
    )

    comp = connected_components(pairs, a_col, b_col)
    grouped = (
        docs.join(comp, docs[id_col] == comp["id"], "left")
        .withColumn(
            "group_id",
            F.coalesce(F.col("comp"), F.col(id_col)).cast("bigint"),
        )
        .drop("id", "comp")
    )
    return hash_split(grouped, "group_id", splits)


def temperature_mixture_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    k: int,
    alpha: float = 0.5,
    mult: int = KNUTH,
) -> DataFrame:
    """Temperature-weighted domain REBALANCING — the multilingual /
    data-recipe sampler (mBERT, XLM-R, T5 all sample language d with
    p_d ∝ n_d^alpha, alpha<1): keep each row of domain d with
    fraction ``min(1, k · n_d^alpha / (S · n_d))`` where
    ``S = Σ_d n_d^alpha`` — flattening the head domains toward the
    tail so low-resource domains aren't drowned, without the manual
    weight table domain_mixture_sample needs.

    Determinism/parity: domain scores are sqrt(n_d) rounded to 1e-6
    fixed-point BIGINTs (sqrt is correctly-rounded IEEE — identical
    in any engine; the default alpha=0.5 is also the common recipe
    value), S is an exact BIGINT sum, and the keep threshold is ONE
    double division of exact integer products — so selection
    replays bit-for-bit in SQL (alpha != 0.5 goes through pow(),
    which is not correctly-rounded; those variants are pinned by
    pytest instead of an oracle). Selection itself is the Knuth unit
    hash — partitioning/retry/layout invariant, no RNG. Cost: one
    domain-sized count aggregation broadcast back; the filter is a
    row-local predicate."""
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    nd = F.col("__n").cast("double")
    raw = (
        F.sqrt(nd)
        if alpha == 0.5
        else F.pow(nd, F.lit(float(alpha)))
    )
    from pyspark.sql import Window

    # S rides along via an empty-partition window — the score table
    # is domain-sized (a handful of rows), so the single-partition
    # stage is free and avoids a self-join on the aggregate's lineage
    scores = counts.withColumn(
        "__s", F.round(raw * F.lit(1_000_000.0), 0).cast("bigint")
    ).withColumn("__tot", F.sum("__s").over(Window.partitionBy()))
    # Denominator multiplies AFTER the double casts: __tot·__n in
    # BIGINT overflows at advertised scale (10 domains × 1e8 rows →
    # tot·n ≈ 1e19 > 2⁶³, silently wrapping negative in non-ANSI mode
    # so the whole domain would be dropped). k·__s stays in BIGINT
    # range (k·√n·1e6 ≪ 2⁶³ for any real n).
    keep = F.least(
        F.lit(1.0),
        (F.lit(int(k)).cast("bigint") * F.col("__s")).cast("double")
        / (F.col("__tot").cast("double") * F.col("__n").cast("double")),
    )
    return (
        df.join(F.broadcast(scores), domain_col)
        .filter(unit_hash(F.col(id_col), mult=mult) < keep)
        .drop("__n", "__s", "__tot")
    )


def curriculum_order(
    docs: DataFrame,
    id_col: str,
    score_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """CURRICULUM training order: rank the corpus into quality
    buckets (highest score first), deterministically shuffle WITHIN
    each bucket, and assign every document its global training
    position — the easy-to-hard data schedule curriculum-learning
    recipes feed a trainer, as a reproducible table rather than a
    runtime sampler. Within-bucket order is the Knuth unit hash of
    the id (layout/retry-invariant pseudo-shuffle — adjacent
    documents are unrelated, which is what the trainer wants), never
    an RNG.

    Both global orders run through the range-partitioned rank
    composition (operators/rank.py:global_row_number) — no
    single-partition window at any scale. Bucket assignment is
    exact equi-depth: bucket = floor((rank-1)·n_buckets / N).
    Returns (id, score, bucket, train_pos)."""
    from eco_pulse_lakehouse_spark.operators.rank import global_row_number

    ranked = global_row_number(
        docs.select(id_col, score_col),
        [F.col(score_col).desc(), F.col(id_col).asc()],
        out_col="__qrank",
    )
    n = ranked.count()
    bucketed = ranked.withColumn(
        "bucket",
        F.floor(
            (F.col("__qrank") - 1) * F.lit(int(n_buckets)) / F.lit(float(n))
        ).cast("int"),
    )
    ordered = global_row_number(
        bucketed,
        [
            F.col("bucket").asc(),
            unit_hash(F.col(id_col)).asc(),
            F.col(id_col).asc(),
        ],
        out_col="train_pos",
    )
    return ordered.select(id_col, score_col, "bucket", "train_pos")
