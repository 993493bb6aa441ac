"""Data-quality gate — expectation checks with quarantine split.

A training-data pipeline's first stage after ingest: declare
expectations as named boolean column expressions, annotate every row
with its violations, and split the stream into (good, quarantined).
Pure column expressions — one pass, no UDFs, streaming-safe (the
silver path can interpose this between parse and sink).

The reference has no dead-letter handling at all (malformed JSON
becomes silent all-NULL rows — SURVEY.md §1.3); this operator is the
engine's answer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VIOLATIONS_COL = "violations"


def annotate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Add an array column naming every violated rule (empty = clean).
    ``rules`` maps rule name -> boolean Column that is TRUE when the
    row PASSES. NULL predicate results count as violations."""
    checks = [
        F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
        for name, pred in rules.items()
    ]
    return df.withColumn(
        VIOLATIONS_COL,
        F.array_compact(F.array(*checks)).cast("array<string>"),
    )


def split(df: DataFrame, rules: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) — quarantined rows keep their violation
    list for triage."""
    annotated = annotate(df, rules)
    good = annotated.filter(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    bad = annotated.filter(F.size(VIOLATIONS_COL) > 0)
    return good, bad


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token-repetition profile (the Gopher-style
    repetition quality rules): total tokens, distinct tokens, the
    modal token's count, and the duplicate-token fraction
    ``1 - distinct/total``.

    Two hash aggregations, both keyed by the document id — the
    explode never shuffles raw tokens across documents and the
    second agg is map-side-combinable, so the op scales linearly in
    corpus size with one shuffle of (id, token) partial counts and
    one of per-doc rows. High dup_frac or a dominant modal token
    flags boilerplate/spam for the curation gate.
    """
    toks = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    per_tok = toks.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
    return per_tok.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_count"),
    ).withColumn(
        "dup_frac",
        F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double"),
    )


def observed_split(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame, "object"]:
    """:func:`split` plus an :class:`~pyspark.sql.Observation` riding
    the annotated frame: whatever action consumes the branches also
    materializes (rows, violation-rows, per-rule violation counts) —
    audit metrics with ZERO extra passes. At 100 TB a separate
    metrics job would re-scan the input; observe() folds the counters
    into the same task set (collected driver-side via
    ``obs.get`` after any action runs).
    """
    from pyspark.sql import Observation

    obs = Observation("quality")
    metrics = [
        F.count(F.lit(1)).alias("rows"),
        F.sum((F.size(VIOLATIONS_COL) > 0).cast("long")).alias("violation_rows"),
    ] + [
        F.sum(
            F.array_contains(VIOLATIONS_COL, name).cast("long")
        ).alias(f"viol_{name}")
        for name in rules
    ]
    annotated = annotate(df, rules).observe(obs, *metrics)
    good = annotated.filter(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    bad = annotated.filter(F.size(VIOLATIONS_COL) > 0)
    return good, bad, obs


def profile_table(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Single-pass column profile: per column row count, null count,
    exact distinct count, and min/max (as strings, so heterogeneous
    column types stack into one tall frame).

    Everything folds into ONE aggregation job (count + count-distinct
    per column in the same Expand-based agg; no per-column scans) —
    at 100 TB the difference between profiling in one pass and N
    passes IS the feature. The tall shape comes from a stack() of
    the wide row, driver-side cost O(columns).
    """
    cols = list(cols if cols is not None else df.columns)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __nulls_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.selectExpr(
        "__rows AS n_rows",
        f"stack({len(cols)}, {stacked}) AS "
        "(column, n_nulls, n_distinct, min_str, max_str)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")


def expectation_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Per-rule violation counts in ONE aggregation pass — the
    table-level contract check (dbt-test / Great-Expectations shape)
    that gates a pipeline stage: assert `passed` over the whole
    report before publishing.

    One wide conditional aggregate (no per-rule scans), then an
    unpivot of the single summary row into (rule, n_violations,
    n_rows, passed) — at 100 TB the scan happens once regardless of
    how many rules are declared. NULL predicate results count as
    violations (same convention as :func:`annotate`).
    """
    aggs = [F.count(F.lit(1)).alias("__rows")] + [
        F.sum(
            F.when(~F.coalesce(pred, F.lit(False)), 1).otherwise(0)
        ).alias(f"__v_{i}")
        for i, (name, pred) in enumerate(rules.items())
    ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', __v_{i}" for i, name in enumerate(rules)
    )
    return wide.select(
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"
        ),
        F.col("__rows").alias("n_rows"),
    ).select(
        "rule",
        "n_violations",
        "n_rows",
        (F.col("n_violations") == 0).alias("passed"),
    )


def hashed_linear_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Linear text-quality classifier inference with the hashing
    trick — the fastText/quality-filter shape every pre-training
    curation pass runs (score every document with a tiny linear
    model, keep the high-probability tail).

    Feature map: token → polynomial char hash → bucket = hash mod
    n_buckets. The weight vector is a plan constant derived per
    bucket (w(b) = ((b·2654435761) mod 1001 − 500)/1000 — standing in
    for trained weights, which would arrive as a broadcast map the
    same way). score = Σ w(bucket(token)); prob squashes score with
    the RATIONAL sigmoid 1/2 + s/(2(1+|s|)) — algebraic, so unlike
    exp()-sigmoid it is bit-identical across libm implementations.

    Scale shape: explode → per-token projection (hash, bucket,
    weight) → groupBy(id) with map-side combine. The shuffle carries
    (id, partial decimal sum) — never text. Weights are multiples of
    1/1000, so DECIMAL(18,4) accumulation is exact and the score is
    independent of partitioning/addition order (the same
    order-independence contract as corpus dec_sum).

    Reference has no content-quality scoring at all (SURVEY.md §1.3);
    this is the engine's curation-gate primitive next to
    repetition_stats and scrub_pii.
    """
    from eco_pulse_lakehouse_spark.functions.text import (
        token_char_hash,
        tokens,
    )

    bucket = token_char_hash(F.col("__tok")) % F.lit(n_buckets)
    weight = (
        (bucket * F.lit(2654435761) % F.lit(1001) - F.lit(500)).cast(
            "double"
        )
        / F.lit(1000.0)
    )
    per_token = df.select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("__tok"),
    ).select(F.col(id_col), weight.alias("__w"))
    scored = per_token.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("__w").cast("decimal(18,4)"))
        .cast("double")
        .alias("score"),
    )
    prob = F.lit(0.5) + F.col("score") / (
        F.lit(2.0) * (F.lit(1.0) + F.abs(F.col("score")))
    )
    return scored.select(
        id_col,
        "n_tokens",
        "score",
        prob.alias("prob"),
        (prob >= F.lit(0.5)).alias("keep"),
    )


def repetition_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Intra-document n-GRAM repetition signals — the word-sequence
    tier of the Gopher/MassiveText repetition filters (Rae et al.
    2021 §A1.1); repetition_stats above is the unigram tier (Gopher
    applies both, n=1..4). Per document,

      n_tokens        — whitespace token count
      ttr             — type-token ratio (distinct/total tokens; low =
                        vocabulary-poor boilerplate)
      dup_ngram_frac  — fraction of word n-grams that are repeats of an
                        earlier n-gram (1 - distinct/total)
      top_ngram_frac  — fraction of all TOKENS covered by occurrences
                        of the single most frequent n-gram

    Machine-generated/boilerplate text scores high on the *_frac
    signals and low on ttr; curation gates threshold these upstream
    of expensive dedup stages.

    Scale shape: the per-doc token-array stats (n_tokens, ttr) are
    pure HOF expressions; the n-gram counts EXPLODE to (doc, gram)
    rows and partial-aggregate — never an O(distinct²) per-doc HOF
    scan, so a 100k-token document costs O(L) shuffled short rows,
    and AQE absorbs doc-length skew. Every division is a single IEEE
    op on exact integer counts — bit-reproducible across engines
    (oracle: corpus x4_repetition_signals).
    """
    from eco_pulse_lakehouse_spark.functions.text import tokens, word_shingles

    toks = tokens(F.col(text_col))
    base = docs.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "ttr"
        ),
        word_shingles(F.col(text_col), n).alias("__grams"),
    )
    gram_stats = (
        base.select(id_col, F.explode("__grams").alias("__g"))
        .groupBy(id_col, "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("__total"),
            F.count(F.lit(1)).alias("__dist"),
            F.max("__c").alias("__maxc"),
        )
    )
    return (
        base.drop("__grams")
        .join(gram_stats, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "ttr",
            F.coalesce(
                F.lit(1.0) - F.col("__dist").cast("double") / F.col("__total"),
                F.lit(0.0),
            ).alias("dup_ngram_frac"),
            # maxc counts OVERLAPPING occurrences, so maxc*n can
            # exceed n_tokens ('a a a a', n=2 → 3*2/4) — clamp to
            # keep the "fraction of tokens covered" contract
            # (Gopher counts covered tokens without double-counting;
            # round-2 ADVICE)
            F.least(
                F.lit(1.0),
                F.coalesce(
                    (F.col("__maxc") * n).cast("double")
                    / F.col("n_tokens"),
                    F.lit(0.0),
                ),
            ).alias("top_ngram_frac"),
        )
    )


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    out_col: str = "clipped",
) -> DataFrame:
    """Per-group winsorization — clip values to the group's
    [p_lo, p_hi] exact percentiles (the outlier-taming step feature
    pipelines run before normalization; q2/q3's z-score and Tukey
    detectors FLAG outliers, this one bounds them).

    Shape: one aggregation computes two percentiles per group (tiny
    result), broadcast back onto the rows — a second narrow pass, no
    wide shuffle of the data side. Percentile bounds round to 6dp
    first (both engines share the (n-1)p interpolation rule —
    a10_quantiles — and rounding removes the last-ulp risk), so the
    least/greatest clip compares identical values everywhere:
    oracle-exact. At 100 TB swap in approx_percentile for the bounds
    pass (a10_approx_quantiles is the precedent); the clip pass is
    unchanged."""
    bounds = df.groupBy(group_col).agg(
        F.round(F.percentile(value_col, F.lit(lo)), 6).alias("__lo"),
        F.round(F.percentile(value_col, F.lit(hi)), 6).alias("__hi"),
    )
    clipped = F.least(
        F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")
    )
    return (
        df.join(F.broadcast(bounds), group_col)
        .withColumn(out_col, clipped)
        .drop("__lo", "__hi")
    )


def quantile_binning(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    out_col: str = "bin",
) -> DataFrame:
    """Per-group quantile discretization (Spark ML's
    QuantileDiscretizer re-expressed as a pure DataFrame op): cut
    points are the group's exact percentiles, a row's bin is the
    count of cut points it exceeds — bin 0..len(probs). Same
    broadcast-bounds shape as winsorize: one tiny percentile
    aggregate joined back, no wide shuffle of the data side; 6dp-
    rounded cut points keep the comparisons identical cross-engine
    (oracle q8_quantile_binning). approx_percentile is the
    documented 100 TB cut-point pass. Values on a cut point land in
    the LOWER bin (strict > comparison) in both engines."""
    aggs = [
        F.round(F.percentile(value_col, F.lit(p)), 6).alias(f"__q{i}")
        for i, p in enumerate(probs)
    ]
    bounds = df.groupBy(group_col).agg(*aggs)
    bin_expr = sum(
        [
            (F.col(value_col) > F.col(f"__q{i}")).cast("int")
            for i in range(len(probs))
        ],
        F.lit(0),
    )
    return (
        df.join(F.broadcast(bounds), group_col)
        .withColumn(out_col, bin_expr)
        .drop(*[f"__q{i}" for i in range(len(probs))])
    )


def profile_diff(
    df_a: DataFrame,
    df_b: DataFrame,
    cols: Sequence[str],
) -> DataFrame:
    """SCHEMA/DISTRIBUTION drift report between two table snapshots —
    the per-column companion to the value-level KS/PSI detectors
    (operators/anomaly.py): profile both sides in ONE aggregation
    pass each (:func:`profile_table`), join on the column name, and
    report row/null/distinct counts side by side plus the derived
    drift signals (distinct-count delta, row-count ratio, min/max
    movement flags). The nightly snapshot-vs-snapshot check a data
    contract runs before anything trains on the new partition."""
    pa = profile_table(df_a, cols).select(
        "column",
        F.col("n_rows").alias("n_rows_a"),
        F.col("n_nulls").alias("n_nulls_a"),
        F.col("n_distinct").alias("n_distinct_a"),
        F.col("min_str").alias("__mn_a"),
        F.col("max_str").alias("__mx_a"),
    )
    pb = profile_table(df_b, cols).select(
        "column",
        F.col("n_rows").alias("n_rows_b"),
        F.col("n_nulls").alias("n_nulls_b"),
        F.col("n_distinct").alias("n_distinct_b"),
        F.col("min_str").alias("__mn_b"),
        F.col("max_str").alias("__mx_b"),
    )
    return pa.join(pb, "column").select(
        "column",
        "n_rows_a", "n_rows_b", "n_nulls_a", "n_nulls_b",
        "n_distinct_a", "n_distinct_b",
        (F.col("n_distinct_b") - F.col("n_distinct_a"))
        .cast("bigint").alias("distinct_delta"),
        (
            F.col("n_rows_b").cast("double")
            / F.col("n_rows_a").cast("double")
        ).alias("row_ratio"),
        (~F.col("__mn_a").eqNullSafe(F.col("__mn_b"))).alias("min_changed"),
        (~F.col("__mx_a").eqNullSafe(F.col("__mx_b"))).alias("max_changed"),
    )


def dataset_card(
    docs: DataFrame,
    domain_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain DATASET CARD — the summary manifest a curation run
    publishes next to its export (HuggingFace dataset-card /
    Datasheets-for-Datasets stats block): document counts, exact
    duplicate counts (docs whose text occurs more than once in the
    WHOLE corpus — cross-domain dups count in every domain they
    touch), whitespace-token and character totals, and the exact
    mean document length. One inverted count on the text key (the
    x1 exact-dedup shuffle shape) plus one domain aggregation;
    everything is BIGINT sums with a final double division, so the
    card replays exactly in SQL. At 100 TB swap the raw text join
    key for the sha256 content_key (operators/dedup.py) — same
    plan, 8-byte-ish keys."""
    from eco_pulse_lakehouse_spark.functions.text import token_count

    text_counts = docs.groupBy(text_col).agg(
        F.count(F.lit(1)).alias("__tc")
    )
    enriched = docs.join(text_counts, text_col).select(
        F.col(domain_col),
        token_count(F.col(text_col)).cast("bigint").alias("__toks"),
        F.length(text_col).cast("bigint").alias("__chars"),
        F.when(F.col("__tc") > 1, 1).otherwise(0).alias("__dup"),
    )
    return enriched.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__dup").cast("bigint").alias("n_dup_docs"),
        F.sum("__toks").cast("bigint").alias("total_ws_tokens"),
        F.sum("__chars").cast("bigint").alias("total_chars"),
        (
            F.sum("__chars").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_doc_chars"),
    )


def k_anonymize(
    df, quasi_cols: list[str], k: int = 5, redacted: str = "*"
):
    """k-anonymity suppression over a quasi-identifier combination
    (Sweeney 2002): rows whose quasi-identifier GROUP holds fewer
    than ``k`` members get those columns redacted, so every released
    combination describes at least k rows — the release-gating step
    a curated corpus needs before shipping per-source/per-language
    metadata next to scrub_pii's in-text redaction.

    Suppression (not generalization): one window count over the
    quasi columns — the same single content-key shuffle as
    exact_dedup — then a row-local CASE per column. Returns the
    input columns (quasi columns redacted where the group is small)
    plus (group_n, suppressed)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(*[F.col(c) for c in quasi_cols])
    n = F.count(F.lit(1)).over(w)
    out = df.withColumn("group_n", n.cast("bigint"))
    small = F.col("group_n") < k
    for c in quasi_cols:
        out = out.withColumn(
            c, F.when(small, F.lit(redacted)).otherwise(F.col(c))
        )
    return out.withColumn("suppressed", small)
