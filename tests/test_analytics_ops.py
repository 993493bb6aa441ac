"""Fixture-level semantics for the funnel / retention / expectation
operators (oracle parity runs separately in test_oracle_parity.py)
and the chained-streaming-windows state shape.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.operators.quality import expectation_report


def test_expectation_report_counts_and_null_handling(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None)], ["id", "price"]
    )
    rules = {
        "price_positive": F.col("price") > 0,
        "id_present": F.col("id").isNotNull(),
    }
    rows = {r["rule"]: r for r in expectation_report(df, rules).collect()}
    # NULL predicate result counts as a violation
    assert rows["price_positive"]["n_violations"] == 2
    assert rows["price_positive"]["passed"] is False
    assert rows["id_present"]["n_violations"] == 0
    assert rows["id_present"]["passed"] is True
    assert all(r["n_rows"] == 3 for r in rows.values())


def test_expectation_report_single_scan(spark):
    df = spark.createDataFrame([(1, 2.0)], ["id", "price"])
    rules = {
        "a": F.col("price") > 0,
        "b": F.col("id") < 10,
        "c": F.col("price") < 100,
    }
    plan = expectation_report(df, rules)._jdf.queryExecution().executedPlan().toString()
    # one aggregate over the source; no union of per-rule subplans
    assert plan.count("LocalTableScan") <= 1


def test_funnel_requires_strict_order(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        # user 1: full ordered funnel
        (1, "signup", t0),
        (1, "click", t0 + timedelta(minutes=1)),
        (1, "purchase", t0 + timedelta(minutes=2)),
        # user 2: purchase BEFORE click → funnel stops at click
        (2, "signup", t0),
        (2, "purchase", t0 + timedelta(minutes=1)),
        (2, "click", t0 + timedelta(minutes=2)),
        # user 3: click before signup doesn't count; none after
        (3, "click", t0 - timedelta(minutes=1)),
        (3, "signup", t0),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    out = {
        r["user_id"]: (r["t2"] is not None, r["t3"] is not None)
        for r in s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .collect()
    }
    assert out == {1: (True, True), 2: (True, False), 3: (False, False)}


def test_chained_windows_second_stage_state_is_preaggregated(spark):
    """The t13 plan must contain TWO stateful aggregation exchanges —
    and the second one's input is the first's output (rows per small
    window), which is the bounded-state claim."""
    from eco_pulse_lakehouse_spark.streaming import pipeline as sp

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .withColumnRenamed("timestamp", "ts")
    )
    rollup = sp.chained_window_rollup(stream, "ts")
    # logical plan: two Aggregate nodes over window expressions
    logical = rollup._jdf.queryExecution().logical().toString()
    assert logical.count("Aggregate") >= 2
    assert "EventTimeWatermark" in logical


def test_hll_merge_equals_direct_and_near_exact(spark):
    """Union of per-day HLL sketches must estimate EXACTLY what a
    single whole-table sketch estimates (same deterministic
    algorithm), and land within 5% of the exact distinct count —
    the property that makes sketch-per-partition + union a safe
    incremental substitute for COUNT DISTINCT."""
    df = spark.range(20000).select(
        (F.col("id") % 37).alias("day"),
        (F.col("id") % 4999).alias("uid"),
    )
    merged = (
        df.groupBy("day")
        .agg(F.hll_sketch_agg("uid").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("uid")).alias("est")
    ).collect()[0]["est"]
    assert merged == direct
    assert abs(merged - 4999) / 4999 < 0.05


def test_cusum_detects_injected_level_shift(spark):
    """A series that jumps +8σ-of-noise halfway must cross the CUSUM
    threshold shortly after the shift; a pure-noise twin must not."""
    import math

    from eco_pulse_lakehouse_spark.operators.anomaly import cusum_changepoints

    noise = [math.sin(i * 0.7) for i in range(60)]  # bounded, mean~0
    shifted = noise[:30] + [x + 8.0 for x in noise[30:]]
    rows = [(1, i, i, float(v)) for i, v in enumerate(shifted)]
    rows += [(2, i, i, float(v)) for i, v in enumerate(noise)]
    df = spark.createDataFrame(
        rows, "user_id INT, ts INT, event_id INT, value DOUBLE"
    )
    out = {
        r.user_id: r
        for r in cusum_changepoints(
            df, "user_id", ("ts", "event_id"), "value"
        ).collect()
    }
    assert out[1].first_cross_idx is not None and out[1].first_cross_idx > 30
    assert out[2].first_cross_idx is None
    assert out[1].max_cusum_sigma > out[2].max_cusum_sigma


def test_capped_sessionize_splits_on_duration_not_just_gap(spark):
    """A steady 20-min cadence never trips the 30-min gap, so plain
    gap sessionization (w7) keeps ONE session; the 2 h duration cap
    must still split it — deterministically at the first event past
    cap from each session's start — and a real gap must also split."""
    from eco_pulse_lakehouse_spark.operators.windows import capped_sessionize

    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=1200 * i), 1)
        for i in range(16)  # t = 0..18000 s, step 1200
    ]
    # separate user: two events split by a 2-hour GAP
    rows += [(100, t0, 2), (101, t0 + datetime.timedelta(seconds=7300), 2)]
    df = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id INT"
    )
    got = {
        r.event_id: r.session_id
        for r in capped_sessionize(
            df, "user_id", "ts", "event_id", gap_s=1800, cap_s=7200
        ).collect()
    }
    # user 1: sessions [0..7200], [8400..15600], [16800..18000] —
    # an event exactly AT cap distance from its session start stays
    expect = {i: 1 for i in range(7)}
    expect.update({i: 2 for i in range(7, 14)})
    expect.update({i: 3 for i in range(14, 16)})
    assert {k: v for k, v in got.items() if k < 100} == expect
    assert got[100] == 1 and got[101] == 2  # gap split still works


def test_ks_and_psi_drift_bounds(spark):
    """KS: 0 for identical samples, 1 for disjoint supports, and an
    injected location shift must move both detectors off zero.
    PSI is non-negative by construction ((p1-p2) and ln(p1/p2)
    always share sign)."""
    from eco_pulse_lakehouse_spark.operators.anomaly import (
        ks_statistic,
        psi_drift,
    )

    base = spark.range(2000).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("v")
    )
    # identical distributions: pair i contributes value i%97 to BOTH
    # sides, so the two multisets are equal by construction
    ident = base.select(
        (F.floor(F.col("id") / 2) % 97).cast("double").alias("v"),
        (F.col("id") % 2 == 0).alias("side"),
    )
    r = ks_statistic(ident, "v", F.col("side")).collect()[0]
    assert r.ks_num == 0 and r.ks_stat == 0.0
    # disjoint supports: KS must saturate at exactly 1
    disj = base.select(
        F.when(F.col("id") % 2 == 0, F.col("v")).otherwise(
            F.col("v") + 1000.0
        ).alias("v"),
        (F.col("id") % 2 == 0).alias("side"),
    )
    r = ks_statistic(disj, "v", F.col("side")).collect()[0]
    assert r.ks_stat == 1.0
    # location shift: both detectors fire, PSI stays non-negative
    shift = base.select(
        F.when(F.col("id") % 2 == 0, F.col("v")).otherwise(
            F.col("v") + 30.0
        ).alias("v"),
        (F.col("id") % 2 == 0).alias("side"),
    )
    ks = ks_statistic(shift, "v", F.col("side")).collect()[0]
    psi = psi_drift(shift, "v", F.col("side"), bin_width=10.0).collect()[0]
    assert ks.ks_stat > 0.2
    assert psi.psi > 0.0


def test_weighted_median_equals_replicated_median(spark):
    """The weighted (lower) median with integral weights must equal
    the plain lower median of the weight-replicated multiset."""
    from eco_pulse_lakehouse_spark.operators.rank import global_running_sum

    rows = [(10.0, 1), (20.0, 3), (30.0, 2), (40.0, 6)]
    df = spark.createDataFrame(rows, "val DOUBLE, wt LONG")
    cum = global_running_sum(df, [F.col("val").asc()], ["wt"])
    tot = df.agg(F.sum("wt").cast("long").alias("__W"))
    got = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.lit(2) * F.col("run_wt") >= F.col("__W"))
        .agg(F.min("val").alias("m"))
        .collect()[0]
        .m
    )
    import statistics

    flat = sorted(v for v, w in rows for _ in range(w))
    assert got == flat[(len(flat) - 1) // 2]  # lower median = 30.0


def test_chi2_drift_zero_on_identical_and_fires_on_shift(spark):
    """chi2: exactly 0 for identical per-bin distributions, strictly
    positive under a location shift, dof = populated ref bins − 1,
    and cur-only bins are excluded (unsmoothed convention)."""
    from eco_pulse_lakehouse_spark.operators.anomaly import chi2_drift

    base = spark.range(2000).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("v")
    )
    ident = base.select(
        (F.floor(F.col("id") / 2) % 97).cast("double").alias("v"),
        (F.col("id") % 2 == 0).alias("side"),
    )
    r = chi2_drift(ident, "v", F.col("side"), bin_width=10.0).collect()[0]
    assert r.chi2_fp == 0 and r.chi2 == 0.0
    assert r.dof == 9  # values 0..96, width 10 -> bins 0..9
    shift = base.select(
        F.when(F.col("id") % 2 == 0, F.col("v")).otherwise(
            F.col("v") + 30.0
        ).alias("v"),
        (F.col("id") % 2 == 0).alias("side"),
    )
    r = chi2_drift(shift, "v", F.col("side"), bin_width=10.0).collect()[0]
    assert r.chi2 > 10.0  # gross shift: far beyond any alpha cutoff
    # reference side only covers bins 0..9; cur-only bins 10..12 are
    # excluded so dof still reflects the REF-populated bins
    assert r.dof == 9


def test_holt_linear_matches_python_reference_and_tracks_trend(spark):
    """holt_linear == the textbook recurrence run in pure python
    (bit-exact, alpha=beta=1/2), converges to the exact slope on a
    linear series, and a single-reading key yields NULL trend."""
    from eco_pulse_lakehouse_spark.operators.timeseries import holt_linear

    t0 = datetime(2024, 3, 1, 10, 0, 0)
    m = timedelta(minutes=1)
    series = {1: [10.0, 14.0, 13.0, 20.0, 18.0, 25.0],
              2: [float(5 + 3 * i) for i in range(40)],  # exact linear
              3: [7.5]}
    rows = [
        (uid * 100 + i, uid, t0 + i * m, v)
        for uid, vs in series.items()
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, ts TIMESTAMP, value DOUBLE"
    )
    out = {
        r.user_id: r
        for r in holt_linear(df, "user_id", "ts", "event_id", "value")
        .collect()
    }

    def ref(vs):
        l, b = vs[0], vs[1] - vs[0]
        for x in vs[1:]:
            ln = 0.5 * x + 0.5 * (l + b)
            b = 0.5 * (ln - l) + 0.5 * b
            l = ln
        return l, b

    l1, b1 = ref(series[1])
    assert out[1].level == l1 and out[1].trend == b1
    assert out[1].forecast_1 == l1 + b1
    # exact linear series: Holt locks onto the slope exactly
    assert abs(out[2].trend - 3.0) < 1e-9
    assert abs(out[2].level - series[2][-1]) < 1e-9
    assert out[3].level == 7.5 and out[3].trend is None


def test_rrf_fusion_scores_and_single_list_docs(spark):
    """rrf_fuse contract: a doc in both lists scores
    1/(60+ra) + 1/(60+rb); single-list docs keep one term; ranking
    is (score desc, id asc)."""
    from eco_pulse_lakehouse_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id LONG, doc_id LONG, rk LONG"
    )
    b = spark.createDataFrame(
        [(1, 10, 2), (1, 12, 1)], "query_id LONG, doc_id LONG, rk LONG"
    )
    out = {r.doc_id: r for r in rrf_fuse(a, b, k=10).collect()}
    assert out[10].rrf_score == round(1 / 61 + 1 / 62, 9)
    assert out[11].rrf_score == round(1 / 62, 9)
    assert out[12].rrf_score == round(1 / 61, 9)
    # both-lists doc outranks either single-list doc
    assert out[10].rk == 1
    # 11 and 12 tie-break: 12 has the higher single-term score
    assert out[12].rk == 2 and out[11].rk == 3


def test_chi2_bins_survive_bigint_scale_counts(spark):
    """Round-5 review regression pin: with ~2e6 counts per side the
    denominator k1*n2*n1 ≈ 8e18 exceeds 2^63 — the per-factor double
    casts must keep the statistic finite, non-negative, and equal to
    the python float computation (a BIGINT product would wrap to a
    negative denominator and flip the term's sign)."""
    from eco_pulse_lakehouse_spark.operators.anomaly import (
        chi2_from_bins,
    )

    bins = [(0, 2_000_000, 2_100_000), (1, 1_900_000, 1_800_000)]
    b = spark.createDataFrame(
        bins, "__bucket LONG, __k1 LONG, __k2 LONG"
    )
    r = chi2_from_bins(b).collect()[0]
    n1 = sum(k1 for _, k1, _ in bins)
    n2 = sum(k2 for _, _, k2 in bins)
    expect = 0.0
    for _, k1, k2 in bins:
        d = float(k2 * n1 - k1 * n2)
        expect += round(
            d * d / (float(k1) * float(n2) * float(n1)) * 1e9
        )
    expect /= 1e9
    assert r.chi2 >= 0
    assert abs(r.chi2 - expect) < 1e-9, (r.chi2, expect)


def test_session_gap_compares_truncated_seconds(spark):
    """Round-5 review regression pin: the lag-gap substrate compares
    TRUNCATED epoch seconds (the w8 both-sides-truncate convention),
    so a true gap of 12h + 0.2s whose floor-seconds diff is exactly
    43200 stays ONE session, while a floor-seconds diff of 43201
    splits — the exact boundary where the old microsecond-INTERVAL
    oracle diverged at sf0.1."""
    from eco_pulse_lakehouse_spark.operators.patterns import (
        sessionized_pattern_matches,
    )
    from pyspark.sql import functions as F_

    base = datetime(2024, 3, 1, 10, 0, 0, 700_000)
    rows = [
        # user 1: second event at +43200.2s; floor diff 43200 -> merge
        (1, 1, base, "signup"),
        (2, 1, base + timedelta(seconds=43200, microseconds=200_000),
         "purchase"),
        # user 2: second event at +43201.2s; floor diff 43201 -> split
        (3, 2, base, "signup"),
        (4, 2, base + timedelta(seconds=43201, microseconds=200_000),
         "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, ts TIMESTAMP, event_type STRING"
    )
    out = sessionized_pattern_matches(
        df, "user_id", "ts", "event_id",
        F_.substring("event_type", 1, 1), "sp",
        gap_seconds=43200,
    ).collect()
    sessions = {(r.user_id, r.session_id): r.journey for r in out}
    assert sessions[(1, 1)] == "sp"      # merged
    assert sessions[(2, 1)] == "s"       # split
    assert sessions[(2, 2)] == "p"


def test_holt_mase_backtest_semantics(spark):
    """MASE contract: an exactly-linear series forecasts perfectly
    (model_mae 0, mase 0 — Holt locks the slope); a constant train
    series yields naive_mae 0 and NULL mase; short keys are
    excluded."""
    from eco_pulse_lakehouse_spark.operators.timeseries import (
        holt_mase_backtest,
    )

    t0 = datetime(2024, 3, 1, 10, 0, 0)
    m = timedelta(minutes=1)
    series = {
        1: [float(5 + 3 * i) for i in range(20)],      # linear
        2: [2.0] * 10 + [9.0, 8.0, 7.0, 6.0],          # constant train
        3: [1.0, 2.0, 3.0],                            # too short
    }
    rows = [
        (uid * 100 + i, uid, t0 + i * m, v)
        for uid, vs in series.items()
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, ts TIMESTAMP, value DOUBLE"
    )
    out = {
        r.user_id: r
        for r in holt_mase_backtest(
            df, "user_id", "ts", "event_id", "value",
            horizon=4, min_train=4,
        ).collect()
    }
    assert 3 not in out
    assert out[1].n_train == 16
    assert abs(out[1].model_mae) < 1e-9 and abs(out[1].mase) < 1e-9
    assert out[1].naive_mae == 3.0
    assert out[2].naive_mae == 0.0 and out[2].mase is None
    assert out[2].model_mae > 0


def test_bollinger_bands_bracket_mean_and_collapse_on_constants(spark):
    """upper >= mean >= lower everywhere; a constant series has zero
    EW variance so both bands equal the value exactly."""
    from eco_pulse_lakehouse_spark.corpus.extended import w22_bollinger

    out = w22_bollinger(spark, "/root/testdata/sf0.001").limit(500).collect()
    assert out
    for r in out:
        assert r.lower_band <= r.ew_mean <= r.upper_band
    import datetime

    const = spark.createDataFrame(
        [
            (i, 1, datetime.datetime(2024, 1, 1, 0, i), 7.5)
            for i in range(10)
        ],
        "event_id LONG, user_id LONG, ts TIMESTAMP, value DOUBLE",
    )
    from pyspark.sql import Window as W_

    w = (
        W_.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-7, 0)
    )
    arr = F.collect_list(F.col("value").cast("double")).over(w)

    def horner(a):
        return F.aggregate(
            F.slice(a, F.lit(2), F.size(a) - 1),
            F.element_at(a, 1),
            lambda acc, x: acc * F.lit(0.5) + x,
        )

    rows = (
        const.select("event_id", arr.alias("a"))
        .select(
            "event_id",
            (horner(F.col("a")) / horner(
                F.transform(F.col("a"), lambda x: F.lit(1.0))
            )).alias("mean"),
        )
        .collect()
    )
    for r in rows:
        assert r.mean == 7.5


def test_time_weighted_avg_carries_prior_day_reading_across_midnight(spark):
    """Round-3 advisor: a day whose first event arrives late must
    inherit the previous day's last reading from midnight, so the
    TWAP covers the full day instead of only first-event-to-midnight."""
    from eco_pulse_lakehouse_spark.operators.timeseries import (
        time_weighted_avg,
    )

    d1 = datetime(2024, 1, 1, 12, 0, 0)   # day 1: value 10 from noon
    d2 = datetime(2024, 1, 2, 18, 0, 0)   # day 2: value 40 from 18:00
    df = spark.createDataFrame(
        [(1, 7, d1, 10.0), (2, 7, d2, 40.0)],
        "event_id LONG, user_id LONG, ts TIMESTAMP, value DOUBLE",
    )
    rows = {
        r.day: r
        for r in time_weighted_avg(
            df, "user_id", "ts", "event_id", "value"
        ).collect()
    }
    # day 1: no prior reading -> noon-to-midnight only, twap = 10
    assert rows["2024-01-01"].total_dur_ms == 12 * 3600 * 1000
    assert rows["2024-01-01"].twap == 10.0
    assert rows["2024-01-01"].n_events == 1
    # day 2: value 10 carried midnight->18:00 (18h), 40 for 6h
    assert rows["2024-01-02"].total_dur_ms == 24 * 3600 * 1000
    assert rows["2024-01-02"].twap == (10.0 * 18 + 40.0 * 6) / 24
    assert rows["2024-01-02"].n_events == 1  # synthetic row not counted


def test_dup_shingle_fraction_keeps_sub_n_word_docs(spark):
    """Round-3 advisor: documents shorter than n words must appear in
    the profile (n_shingles 0, dup_frac NULL), not silently vanish."""
    from eco_pulse_lakehouse_spark.operators.dedup import (
        dup_shingle_fraction,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),
            (3, "too short"),
        ],
        "doc_id LONG, text STRING",
    )
    rows = {r.doc_id: r for r in dup_shingle_fraction(df, n=4).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[3].n_shingles == 0 and rows[3].n_dup == 0
    assert rows[3].dup_frac is None
    # docs 1/2 share the 4-gram 'alpha beta gamma delta' (position 0)
    assert rows[1].n_shingles == 2 and rows[1].n_dup == 1
    assert rows[1].dup_frac == 0.5


def test_sessionized_pattern_match_semantics(spark):
    """MATCH_RECOGNIZE contract: contiguous rows only (an 'e' breaks
    A B+ C), the session gap ends a match scope, B+ is greedy, and
    matches don't overlap (skip past last row)."""
    from eco_pulse_lakehouse_spark.operators.patterns import (
        sessionized_pattern_matches,
    )

    t0 = datetime(2024, 3, 1, 10, 0, 0)
    m = timedelta(minutes=1)

    def ev(i, minutes, et):
        return (i, 1, t0 + minutes * m, et)

    rows = [
        # session 1: s c v p  -> one match (greedy run), then s e p
        # -> error breaks contiguity, no second match
        ev(1, 0, "signup"), ev(2, 1, "click"), ev(3, 2, "view"),
        ev(4, 3, "purchase"), ev(5, 4, "signup"), ev(6, 5, "error"),
        ev(7, 6, "purchase"),
        # session 2 (gap > 30 min): s c ... then the p lands in
        # session 3 -> the pattern must NOT match across the gap
        ev(8, 120, "signup"), ev(9, 121, "click"),
        ev(10, 240, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, ts TIMESTAMP, event_type STRING"
    )
    from pyspark.sql import functions as F_

    out = {
        r.session_id: r
        for r in sessionized_pattern_matches(
            df, "user_id", "ts", "event_id",
            F_.substring("event_type", 1, 1), "s[cv]+p",
        ).collect()
    }
    assert out[1].journey == "scvpsep"
    assert out[1].n_matches == 1
    assert out[1].first_match_pos == 1
    assert out[1].matched_chars == 4  # greedy: s c v p
    assert out[2].journey == "sc" and out[2].n_matches == 0
    assert out[2].first_match_pos == 0 and out[2].matched_chars == 0
    assert out[3].journey == "p" and out[3].n_matches == 0


def test_multi_pattern_alternation_and_reluctant_contrast(spark):
    """The w27 surface: sequence alternation s(?:cv|vc)+p matches
    alternating click-view UNITS only (scvvcp yes, scvcp no — a
    character class would accept both), and the reluctant s[cvp]+?p
    stops at the FIRST purchase while its greedy twin swallows it
    (scpvp: 'scp' vs 'scpvp')."""
    from eco_pulse_lakehouse_spark.operators.patterns import (
        sessionized_multi_pattern_matches,
    )
    from pyspark.sql import functions as F_

    t0 = datetime(2024, 3, 1, 10, 0, 0)
    m = timedelta(minutes=1)
    # one user per journey so each session is independent
    journeys = {1: "scvvcp", 2: "scvcp", 3: "scpvp"}
    et = {"s": "signup", "c": "click", "v": "view", "p": "purchase"}
    rows = [
        (uid * 100 + i, uid, t0 + i * m, et[ch])
        for uid, j in journeys.items()
        for i, ch in enumerate(j)
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, ts TIMESTAMP, event_type STRING"
    )
    out = {
        r.user_id: r
        for r in sessionized_multi_pattern_matches(
            df, "user_id", "ts", "event_id",
            F_.substring("event_type", 1, 1),
            {"alt": "s(?:cv|vc)+p", "rel": "s[cvp]+?p",
             "grd": "s[cvp]+p"},
        ).collect()
    }
    # alternation: unit-level, not character-class
    assert out[1].n_alt == 1 and out[1].chars_alt == 6   # s cv vc p
    assert out[2].n_alt == 0                             # scvcp: no unit split
    # reluctant stops at first p; greedy swallows it
    assert out[3].n_rel == 1 and out[3].chars_rel == 3   # 'scp'
    assert out[3].n_grd == 1 and out[3].chars_grd == 5   # 'scpvp'
    # on a single-purchase journey they coincide
    assert out[2].n_rel == out[2].n_grd == 1
    assert out[2].chars_rel == out[2].chars_grd == 5


def test_twap_daily_materializes_gap_days_and_matches_twap_on_event_days(spark):
    """time_weighted_avg_daily: a silent day inside a hold appears
    with the held value and zero events; on days WITH events it is
    identical to time_weighted_avg (same carry-in and clamps)."""
    from eco_pulse_lakehouse_spark.operators.timeseries import (
        time_weighted_avg,
        time_weighted_avg_daily,
    )

    rows = [
        (1, 7, datetime(2024, 1, 1, 12, 0, 0), 10.0),   # holds 3 days
        (2, 7, datetime(2024, 1, 4, 6, 0, 0), 40.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, ts TIMESTAMP, value DOUBLE"
    )
    daily = {r.day: r for r in time_weighted_avg_daily(
        df, "user_id", "ts", "event_id", "value").collect()}
    # silent gap days fully covered by the held reading
    for gap_day in ("2024-01-02", "2024-01-03"):
        r = daily[gap_day]
        assert r.n_events == 0
        assert r.total_dur_ms == 86_400_000
        assert r.twap == 10.0
    assert daily["2024-01-01"].total_dur_ms == 12 * 3600 * 1000
    assert daily["2024-01-04"].n_events == 1
    # day 4: 10.0 held midnight->06:00, then 40.0 to midnight
    assert daily["2024-01-04"].twap == (10.0 * 6 + 40.0 * 18) / 24
    # event-day rows identical to time_weighted_avg
    twap = {r.day: r for r in time_weighted_avg(
        df, "user_id", "ts", "event_id", "value").collect()}
    for day, r in twap.items():
        assert (daily[day].n_events, daily[day].total_dur_ms,
                daily[day].twap) == (r.n_events, r.total_dur_ms, r.twap)


def test_hw_seasonal_matches_python_reference_and_locks_pattern(spark):
    """holt_winters_seasonal == the textbook additive recurrence run
    in pure python (bit-exact, alpha=beta=gamma=1/2, m=4); on an
    exactly (linear + period-4) series the one-step forecast nails
    the true next value; keys under 2m readings are excluded."""
    from eco_pulse_lakehouse_spark.operators.timeseries import (
        holt_winters_seasonal,
    )

    t0 = datetime(2024, 3, 1, 10, 0, 0)
    mi = timedelta(minutes=1)
    pat = [4.0, -1.0, 2.5, -5.5]
    series = {
        1: [10.0, 12.0, 14.0, 16.0, 11.0, 13.0, 15.0, 17.0, 12.5, 14.5],
        2: [2.0 * i + pat[i % 4] for i in range(40)],  # linear+seasonal
        3: [1.0] * 7,                                  # too short
    }
    rows = [
        (uid * 100 + i, uid, t0 + i * mi, v)
        for uid, vs in series.items()
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, ts TIMESTAMP, value DOUBLE"
    )
    out = {
        r.user_id: r
        for r in holt_winters_seasonal(
            df, "user_id", "ts", "event_id", "value", season=4
        ).collect()
    }

    def ref(vs, m=4):
        def seq(a):
            t = 0.0
            for x in a:
                t = t + x
            return t

        l = seq(vs[:m]) / float(m)
        b = (seq(vs[m:2 * m]) - seq(vs[:m])) / float(m * m)
        s = [x - l for x in vs[:m]]
        for x in vs[2 * m:]:
            s_old = s[0]
            ln = 0.5 * (x - s_old) + 0.5 * (l + b)
            bn = 0.5 * (ln - l) + 0.5 * b
            sn = 0.5 * (x - l - b) + 0.5 * s_old
            l, b = ln, bn
            s = s[1:] + [sn]
        return l, b, s

    l1, b1, s1 = ref(series[1])
    assert out[1].level == l1 and out[1].trend == b1
    assert out[1].season_next == s1[0]
    assert out[1].forecast_1 == l1 + b1 + s1[0]
    # linear+seasonal: geometric convergence locks on (within ~2%
    # of one step after 32 updates; naive would be off by >= 2.0)
    true_next = 2.0 * 40 + pat[40 % 4]
    assert abs(out[2].forecast_1 - true_next) < 0.1
    assert abs(out[2].trend - 2.0) < 0.01
    assert 3 not in out


def test_hw_mase_backtest_semantics(spark):
    """Seasonal MASE contract: an exactly (linear + period-4) series
    backtests to ~0 model MAE and ~0 mase; a train prefix that is
    exactly period-4 periodic has snaive_mae 0 and NULL mase; short
    keys are excluded."""
    from eco_pulse_lakehouse_spark.operators.timeseries import (
        hw_mase_backtest,
    )

    t0 = datetime(2024, 3, 1, 10, 0, 0)
    mi = timedelta(minutes=1)
    pat = [4.0, -1.0, 2.5, -5.5]
    series = {
        1: [2.0 * i + pat[i % 4] for i in range(40)],
        # periodic train (snaive perfect), then a broken test tail
        2: [pat[i % 4] for i in range(16)] + [50.0, 60.0, 70.0, 80.0],
        3: [1.0] * 15,  # 15 < 3m + horizon = 16
    }
    rows = [
        (uid * 100 + i, uid, t0 + i * mi, v)
        for uid, vs in series.items()
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, ts TIMESTAMP, value DOUBLE"
    )
    out = {
        r.user_id: r
        for r in hw_mase_backtest(
            df, "user_id", "ts", "event_id", "value",
            season=4, horizon=4,
        ).collect()
    }
    assert 3 not in out
    assert out[1].n_train == 36
    # geometric lock-on: far below the snaive denominator
    assert out[1].model_mae < 0.2 and out[1].mase < 0.03
    assert out[1].snaive_mae == 8.0  # |x_t - x_{t-4}| = 8 everywhere
    assert out[2].snaive_mae == 0.0 and out[2].mase is None
    assert out[2].model_mae > 0


def test_incremental_components_update_merges_only_affected(spark):
    """incremental_components_update contract: a new edge bridging
    two existing clusters relabels BOTH to the min id; an untouched
    cluster's labels carry forward; brand-new nodes enter with the
    batch; the star-forest invariant (comp = min reachable id)
    holds on the output."""
    from eco_pulse_lakehouse_spark.operators.components import (
        connected_components,
        incremental_components_update,
    )

    prior = spark.createDataFrame(
        # cluster {1,5,9}, cluster {2,7}, cluster {3,8}
        [(1, 1), (5, 1), (9, 1), (2, 2), (7, 2), (3, 3), (8, 3)],
        "id LONG, comp LONG",
    )
    new_pairs = spark.createDataFrame(
        # bridge {2,7} and {3,8} via 7-8; new nodes 20-21 pair up
        [(7, 8), (20, 21)], "id_a LONG, id_b LONG"
    )
    out = {
        r.id: r.comp
        for r in incremental_components_update(prior, new_pairs).collect()
    }
    assert out == {1: 1, 5: 1, 9: 1,           # untouched
                   2: 2, 7: 2, 3: 2, 8: 2,     # merged to min id 2
                   20: 20, 21: 20}             # new cluster
    # equivalence with one-shot CC over the full accumulated graph
    full_edges = spark.createDataFrame(
        [(1, 5), (1, 9), (2, 7), (3, 8), (7, 8), (20, 21)],
        "id_a LONG, id_b LONG",
    )
    batch = {r.id: r.comp for r in connected_components(full_edges).collect()}
    assert out == batch


def test_pin_round_stats_constant_across_rounds(spark):
    """Regression pin for the r12 iterative-CC stats fix (VERDICT r12
    item 4): _pin_round must REBUILD the round state over the
    checkpointed RDD so the optimized plan reports the constant
    default sizeInBytes. Plain localCheckpoint inherits the origin
    plan's stats, and a self-join loop SQUARES them per round
    (bit length ~doubles — measured 20→2431 bits over 8 rounds),
    OOM-ing the driver's BigInteger stats arithmetic by ~round 30 at
    sf1. If a PySpark upgrade renames internalCreateDataFrame the
    broadened Exception fallback silently reverts to the inheriting
    behavior — this test then fails loudly on the doubling instead
    of resurfacing the OOM at scale."""
    from eco_pulse_lakehouse_spark.operators.components import _pin_round

    def bits(df):
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        ).bit_length()

    state = spark.range(64).select(F.col("id"), F.col("id").alias("comp"))
    seen = []
    for _ in range(10):
        jumped = state.select(
            F.col("id").alias("__jid"), F.col("comp").alias("__jcomp")
        )
        nxt = state.join(
            jumped, state["comp"] == jumped["__jid"], "left"
        ).select(
            "id",
            F.least(
                F.col("comp"), F.coalesce("__jcomp", "comp")
            ).alias("comp"),
        )
        state = _pin_round(nxt)
        seen.append(bits(state))
    # the rebuilt state reports the DEFAULT sizeInBytes every round:
    # constant bit length, and small enough that ten rounds of
    # compounding would have blown far past it (10 doublings of the
    # initial plan's stats exceed 1000 bits; the default is 63)
    assert len(set(seen)) == 1, f"round stats not constant: {seen}"
    assert seen[0] <= 64, f"round stats not the default size: {seen}"
