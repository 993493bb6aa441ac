"""Anomaly / outlier detection over measurement streams.

The reference's whole domain is sensor readings feeding a risk CASE
chain; the missing analytical layer is flagging readings that are
anomalous FOR THEIR GROUP (a 40 °C reading is normal in one region,
an instrument fault in another). Two standard detectors, both pure
aggregation + join (scales as a groupBy, no iteration):

  z-score  — |x - mean| / stddev over the group exceeds k
  IQR      — outside [q1 - k·iqr, q3 + k·iqr] (robust to the
             outliers themselves inflating the spread)

Float determinism: z-scores and fences are rounded to 6 decimals so
a threshold comparison never straddles engines' last-ulp variance
differences (same policy as every order-sensitive aggregate here).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_outliers(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Rows whose value deviates more than ``threshold`` sample
    standard deviations from their group mean. One partial-aggregated
    groupBy + one broadcast-or-shuffle join back; groups with a
    single row (stddev NULL) flag nothing."""
    stats = df.groupBy(*keys).agg(
        F.avg(value_col).alias("__mean"),
        F.stddev_samp(value_col).alias("__sd"),
    )
    z = F.round(
        F.abs(F.col(value_col) - F.col("__mean")) / F.col("__sd"), 6
    )
    return (
        df.join(stats, on=list(keys))
        .withColumn("zscore", z)
        .filter(F.col("zscore") > threshold)
        .drop("__mean", "__sd")
    )


def iqr_outliers(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    k: float = 1.5,
) -> DataFrame:
    """Tukey-fence outliers per group: value outside
    [q1 - k·iqr, q3 + k·iqr] with linear-interpolated quartiles
    (both engines use the (n-1)p rule). Robust where z-score is not:
    extreme outliers inflate the stddev but barely move quartiles."""
    fences = df.groupBy(*keys).agg(
        F.percentile(value_col, F.lit(0.25)).alias("__q1"),
        F.percentile(value_col, F.lit(0.75)).alias("__q3"),
    )
    lo = F.round(F.col("__q1") - F.lit(k) * (F.col("__q3") - F.col("__q1")), 6)
    hi = F.round(F.col("__q3") + F.lit(k) * (F.col("__q3") - F.col("__q1")), 6)
    return (
        df.join(fences, on=list(keys))
        .withColumn("__lo", lo)
        .withColumn("__hi", hi)
        .filter(
            (F.col(value_col) < F.col("__lo"))
            | (F.col(value_col) > F.col("__hi"))
        )
        .withColumn("fence_lo", F.col("__lo"))
        .withColumn("fence_hi", F.col("__hi"))
        .drop("__q1", "__q3", "__lo", "__hi")
    )


def mad_outliers(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Modified z-score outliers via the Median Absolute Deviation
    (Iglewicz & Hoaglin 1993): flag rows where
    ``|0.6745·(x − median) / MAD| > threshold``. The most robust of
    the three detectors (q2 z-score breaks when outliers inflate the
    stddev; q3's quartile fences move a little; the MAD has a 50%
    breakdown point) — the default for contaminated sensor feeds.

    Shape: two aggregation passes over the SAME grouping key — the
    median, then the median of absolute deviations (which needs the
    first result joined back; an inherent two-pass statistic) — and
    both aggregate to one row per group, so the joins broadcast at
    any scale where the key cardinality is dim-like. Interpolated
    medians follow the shared (n-1)p rule and the modified z rounds
    to 6dp before the threshold compare (the q2/q3 engine-parity
    rule). Zero-MAD groups (>50% identical values) yield NULL mod_z
    and are not flagged — surfaced by the companion profile, not
    silently divided."""
    med = df.groupBy(*keys).agg(
        F.percentile(value_col, F.lit(0.5)).alias("__med")
    )
    with_med = df.join(med, on=list(keys))
    mad = with_med.groupBy(*keys).agg(
        F.percentile(
            F.abs(F.col(value_col) - F.col("__med")), F.lit(0.5)
        ).alias("__mad")
    )
    mod_z = F.round(
        F.lit(0.6745)
        * (F.col(value_col) - F.col("__med"))
        / F.col("__mad"),
        6,
    )
    return (
        with_med.join(mad, on=list(keys))
        .withColumn("mod_z", mod_z)
        .filter(F.abs(F.col("mod_z")) > threshold)
        .withColumn("group_median", F.round(F.col("__med"), 6))
        .drop("__med", "__mad")
    )


def seasonal_topk_deviants(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    value_col: str,
    k: int = 3,
    scale: int = 1000,
) -> DataFrame:
    """Top-k deviations from a SEASONAL baseline (hour-of-day): for
    each season bucket, the k rows whose value sits farthest from the
    bucket mean — without ever dividing (the residual is compared as
    ``v·n − Σv``, an exact integer once values are quantized to
    1/``scale`` fixed-point).

    Integer arithmetic end-to-end means no float summation-order
    drift, no stddev rounding, and bit-identical results on any
    partitioning — q2's z-score twin rounds through doubles instead.
    Scale shape: the seasonal table is 24 rows (broadcast); one
    groupBy shuffle for the sums, one ranking window per bucket.
    """
    v_fp = F.floor(F.col(value_col) * scale).cast("long")
    hr = F.hour(F.col(ts_col))
    q = df.select(
        F.col(id_col), hr.alias("hr"), v_fp.alias("__v_fp"), F.col(value_col)
    )
    stats = q.groupBy("hr").agg(
        F.sum("__v_fp").alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    resid = F.col("__v_fp") * F.col("__n") - F.col("__s")
    w = Window.partitionBy("hr").orderBy(
        F.abs(resid).desc(), F.col(id_col).asc()
    )
    return (
        q.join(F.broadcast(stats), "hr")
        .withColumn("resid_fp", resid)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "hr", id_col, value_col,
            "resid_fp", F.col("rk").cast("bigint").alias("rk"),
        )
    )


def cusum_changepoints(
    events: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
    threshold_sigma: float = 5.0,
    slack_sigma: float = 0.5,
) -> DataFrame:
    """One-sided CUSUM change-point detection per key (Page 1954):
    the classic drift detector a data-quality monitor runs over
    per-source metric series. With per-key mean μ and stddev σ,

        S_0 = 0;  S_i = max(0, S_{i-1} + (x_i − μ − kσ))

    where k = slack_sigma; an upward level shift accumulates in S,
    noise drains back to 0. Reports each key's max CUSUM (in σ
    units) and the 1-based index of the first crossing of
    h = threshold_sigma·σ (NULL if never crossed).

    Exactness discipline (same as SAX): μ/σ come from sequential
    double folds over the (order_cols)-sorted series, sqrt is
    correctly rounded, the recurrence is a SINGLE sequential fold
    with a struct accumulator (position, S, max-S, first-cross).
    The oracle replays the identical recurrence with a RECURSIVE
    CTE, NOT list_reduce: DuckDB's struct-fold evaluates accumulator
    field references against the NEW struct (measured: a field
    reading acc.<other_field> sees the other field's updated value
    regardless of declaration order), so any cross-field recurrence
    is unsound there — Spark's F.aggregate has no such issue. With
    the CTE replay the detector is oracle-exact (q9_cusum). max_cusum reports in σ units rounded
    6dp; the σ=0 degenerate series reports 0/NULL.

    Scale: one shuffle to group each key's series; the scan is
    row-local. Long series chunk by (key, time bucket) like SAX."""
    ordered = F.array_sort(F.collect_list(F.struct(*order_cols, value_col)))
    series = events.groupBy(key_col).agg(
        F.transform(ordered, lambda r: r.getField(value_col).cast("double"))
        .alias("__v")
    )
    n = F.size("__v")
    mu = F.aggregate(F.col("__v"), F.lit(0.0), lambda a, x: a + x) / n
    var = (
        F.aggregate(
            F.col("__v"), F.lit(0.0), lambda a, x: a + (x - mu) * (x - mu)
        )
        / n
    )
    sigma = F.sqrt(var)
    h = F.lit(threshold_sigma) * sigma
    k = F.lit(slack_sigma) * sigma

    init = F.struct(
        F.lit(0).cast("int").alias("i"),
        F.lit(0.0).alias("s"),
        F.lit(0.0).alias("mx"),
        F.lit(None).cast("int").alias("cross"),
    )

    def step(acc, x):
        i = acc.getField("i") + 1
        s = F.greatest(
            F.lit(0.0), acc.getField("s") + (x - mu - k)
        )
        mx = F.greatest(acc.getField("mx"), s)
        cross = F.coalesce(
            acc.getField("cross"), F.when(s > h, i)
        )
        return F.struct(
            i.alias("i"), s.alias("s"), mx.alias("mx"), cross.alias("cross")
        )

    fin = F.aggregate(F.col("__v"), init, step)
    max_sigma = F.when(
        sigma > 0, F.round(fin.getField("mx") / sigma, 6)
    ).otherwise(F.lit(0.0))
    return series.select(
        key_col,
        n.cast("int").alias("n"),
        max_sigma.alias("max_cusum_sigma"),
        fin.getField("cross").alias("first_cross_idx"),
    )


def ks_statistic(
    df: DataFrame,
    value_col: str,
    in_first: "F.Column",
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic, EXACT — the
    distribution-drift detector (training-serving skew, snapshot
    drift monitoring): ``D = max_v |F1(v) − F2(v)|`` over empirical
    CDFs of the two samples, computed as exact integer
    cross-products ``|c1·n2 − c2·n1|`` so there is no float
    accumulation anywhere and the result is bit-identical on any
    engine/partitioning (a rational with denominator n1·n2; the
    final ``ks_stat`` is ONE double division). Rows with
    ``in_first`` true form sample 1, the rest sample 2.

    Scale shape: collapse to the distinct-value count table first
    (one partial-agg shuffle), then cumulative counts via the
    range-partitioned running-sum composition
    (operators/rank.py:global_running_sum) — NO single-partition
    window stage, the trap a bare Window.orderBy would plan. The
    cross-products run in DECIMAL(38,0); the reported ``ks_num``
    fits BIGINT while n1·n2 < 2^63 (≈3·10⁹ rows per side) —
    beyond that read ``ks_stat``. NULL values form their own
    distinct-value group and sort per the engine's null ordering —
    filter them out first (the corpus entry does) unless both
    engines' conventions are acceptable. Returns one row
    (n1, n2, ks_num, ks_stat) — or ZERO rows when the input is
    empty (matching SQL's GROUP BY over nothing; guard .collect()
    accordingly)."""
    v = df.groupBy(F.col(value_col).alias("__v")).agg(
        F.sum(F.when(in_first, 1).otherwise(0)).alias("__k1"),
        F.sum(F.when(in_first, 0).otherwise(1)).alias("__k2"),
    )
    return ks_from_value_counts(v)


def ks_from_value_counts(v: DataFrame) -> DataFrame:
    """KS from a (``__v``, ``__k1``, ``__k2``) distinct-value count
    table — the tail of :func:`ks_statistic`, exposed separately
    because value counts are LINEAR (union + sum merges them
    exactly), which lets a streaming monitor accumulate per-batch
    partials and still report the exact batch statistic
    (t24_stream_ks, the KS twin of t23's PSI pattern)."""
    from eco_pulse_lakehouse_spark.operators.rank import global_running_sum

    cum = global_running_sum(v, [F.col("__v").asc()], ["__k1", "__k2"])
    dec = "decimal(38,0)"
    tot = v.agg(
        F.sum("__k1").cast("long").alias("__n1"),
        F.sum("__k2").cast("long").alias("__n2"),
    )
    diff = F.abs(
        F.col("run___k1").cast(dec) * F.col("__n2")
        - F.col("run___k2").cast(dec) * F.col("__n1")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max("__n1").alias("n1"),
            F.max("__n2").alias("n2"),
            F.max(diff).cast("long").alias("ks_num"),
            (
                F.max(diff).cast("double")
                / (F.max("__n1") * F.max("__n2")).cast("double")
            ).alias("ks_stat"),
        )
        # empty input (no values at all) -> ZERO rows, not one
        # all-NULL row — matching the oracle's GROUP BY over nothing
        .filter(F.col("n1").isNotNull())
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    in_first: "F.Column",
    bin_width: float = 10.0,
) -> DataFrame:
    """Population Stability Index between two samples over equi-width
    bins — the KS statistic's production sibling (feature-drift
    dashboards report PSI; >0.2 is the conventional alarm):
    ``PSI = Σ_bins (p1 − p2) · ln(p1/p2)``. Bins where either side
    is empty are excluded (the standard unsmoothed convention —
    smoothing constants are a caller policy, not an engine one).

    Determinism: bin counts are exact integers from ONE
    map-side-combinable aggregation (bounded bins ⇒ tiny shuffle at
    any scale); ln runs on a single exact ratio of BIGINT
    cross-products and is rounded to 6dp BEFORE the multiply (the
    transcendental-parity rule — ln is the only non-correctly-
    rounded op here), and each term is 1e-9 fixed-point BIGINT so
    the final sum is order-independent. Returns one row
    (n1, n2, psi_fp, psi) — or ZERO rows when no bin has both sides
    populated (matching the oracle's empty GROUP BY; guard
    .collect() accordingly).

    NULL handling: NULL ``value_col`` rows are dropped BEFORE
    bucketing (round-3 advisor: floor(NULL)=NULL would otherwise
    form a NULL bucket that still counts toward n1/n2 and adds a
    PSI term whenever both sides contain NULLs) — same convention
    as :func:`ks_statistic`."""
    bucket = F.floor(F.col(value_col) / F.lit(float(bin_width))).cast(
        "bigint"
    )
    df = df.filter(F.col(value_col).isNotNull())
    b = df.groupBy(bucket.alias("__bucket")).agg(
        F.sum(F.when(in_first, 1).otherwise(0)).alias("__k1"),
        F.sum(F.when(in_first, 0).otherwise(1)).alias("__k2"),
    )
    return psi_from_bins(b)


def psi_from_bins(b: DataFrame) -> DataFrame:
    """PSI from a (``__bucket``, ``__k1``, ``__k2``) bin-count table —
    the tail of :func:`psi_drift`, exposed separately because bin
    counts are LINEAR (mergeable by union + sum), which is what lets
    a streaming monitor accumulate per-micro-batch partials and
    still report the exact batch PSI (t23_stream_psi)."""
    tot = b.agg(
        F.sum("__k1").cast("long").alias("__n1"),
        F.sum("__k2").cast("long").alias("__n2"),
    )
    p1 = F.col("__k1").cast("double") / F.col("__n1").cast("double")
    p2 = F.col("__k2").cast("double") / F.col("__n2").cast("double")
    lnr = F.round(
        F.log(
            (F.col("__k1") * F.col("__n2")).cast("double")
            / (F.col("__k2") * F.col("__n1")).cast("double")
        ),
        6,
    )
    term_fp = F.round((p1 - p2) * lnr * F.lit(1e9), 0).cast("bigint")
    return (
        b.crossJoin(F.broadcast(tot))
        .filter((F.col("__k1") > 0) & (F.col("__k2") > 0))
        .agg(
            F.max("__n1").alias("n1"),
            F.max("__n2").alias("n2"),
            F.sum(term_fp).cast("long").alias("psi_fp"),
            (F.sum(term_fp).cast("double") / F.lit(1e9)).alias("psi"),
        )
        # every bin one-sided -> no PSI terms -> ZERO rows, matching
        # the oracle's GROUP BY over an empty terms set
        .filter(F.col("n1").isNotNull())
    )


def chi2_drift(
    df: DataFrame,
    value_col: str,
    in_first: "F.Column",
    bin_width: float = 10.0,
) -> DataFrame:
    """Two-sample chi-square drift statistic over equi-width bins —
    the hypothesis-test sibling of :func:`psi_drift` (PSI reports a
    score; chi2/dof feeds a p-value):

      chi2 = sum_bins (k2 - E)^2 / E,  E = k1 * n2 / n1

    (sample 1 is the REFERENCE; bins with an empty reference side
    are excluded — the same unsmoothed convention as PSI, where
    smoothing constants are caller policy). Each term is computed
    from the exact integer cross-product d = k2*n1 - k1*n2 (exact as
    double while counts stay under ~3e6 per side — d < 2^53) divided
    by the denominator k1*n2*n1 built from PER-FACTOR double casts
    (a BIGINT product would silently wrap past 2^63 at ~2e6 rows per
    side with ANSI off — round-5 review; two double multiplies are
    deterministic on identical operands and the oracle mirrors the
    same cast order), and each term is quantized to a 1e-9
    fixed-point BIGINT so the sum is order-independent (q12's
    discipline). Returns one row
    (n1, n2, chi2_fp, chi2, dof = populated_bins - 1) or zero rows
    when no bin has a populated reference side. NULL values are
    dropped before bucketing (the q12 NULL rule)."""
    bucket = F.floor(F.col(value_col) / F.lit(float(bin_width))).cast(
        "bigint"
    )
    df = df.filter(F.col(value_col).isNotNull())
    b = df.groupBy(bucket.alias("__bucket")).agg(
        F.sum(F.when(in_first, 1).otherwise(0)).alias("__k1"),
        F.sum(F.when(in_first, 0).otherwise(1)).alias("__k2"),
    )
    return chi2_from_bins(b)


def chi2_from_bins(b: DataFrame) -> DataFrame:
    """chi-square from a (``__bucket``, ``__k1``, ``__k2``) bin-count
    table — split out like :func:`psi_from_bins` because bin counts
    are LINEAR partials (union + sum), so a streaming monitor can
    accumulate per-micro-batch bins and serve the exact batch
    statistic."""
    tot = b.agg(
        F.sum("__k1").cast("long").alias("__n1"),
        F.sum("__k2").cast("long").alias("__n2"),
    )
    d = (
        F.col("__k2") * F.col("__n1") - F.col("__k1") * F.col("__n2")
    ).cast("double")
    # Each FACTOR casts to double BEFORE multiplying (round-5 review):
    # the BIGINT product k1*n2*n1 silently wraps past 2^63 at ~2e6
    # rows per side (ANSI off) while the oracle's HUGEINT stays
    # right. Two double multiplies are deterministic on identical
    # operands — the oracle mirrors the same per-factor casts so both
    # engines round identically.
    denom = (
        F.col("__k1").cast("double")
        * F.col("__n2").cast("double")
        * F.col("__n1").cast("double")
    )
    term_fp = F.round(d * d / denom * F.lit(1e9), 0).cast("bigint")
    return (
        b.crossJoin(F.broadcast(tot))
        .filter(F.col("__k1") > 0)
        .groupBy("__n1", "__n2")
        .agg(
            F.sum(term_fp).cast("bigint").alias("chi2_fp"),
            (F.sum(term_fp).cast("double") / F.lit(1e9)).alias("chi2"),
            (F.count(F.lit(1)) - F.lit(1)).cast("bigint").alias("dof"),
        )
        .select(
            F.col("__n1").alias("n1"),
            F.col("__n2").alias("n2"),
            "chi2_fp", "chi2", "dof",
        )
    )
