"""Accuracy bounds for the sketch-based 100 TB-path aggregates
(promised by the corpus docstrings of the rows-only entries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.catalog import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    ev = load_table(spark, SF, "events")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id", 0.05)).first()[0]
    assert abs(approx - exact) / exact <= 0.15  # 3x the 5% rsd


def test_approx_percentile_close_to_exact(spark):
    li = load_table(spark, SF, "lineitem")
    rows = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(1000)).alias(
            "approx"
        ),
    ).collect()
    for r in rows:
        assert abs(r.approx - r.exact) / r.exact <= 0.02


def test_countmin_never_undercounts_and_merges(spark):
    """CMS invariants: (1) est >= exact for every key (min of depth
    buckets only ever adds collisions); (2) sketches are linear —
    per-language sketches merged cell-wise equal the sketch built in
    one pass, so incremental maintenance never drifts."""
    from eco_pulse_lakehouse_spark.functions.text import tokens
    from eco_pulse_lakehouse_spark.operators import sketches as sk

    d = load_table(spark, SF, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("w"))
    sketch = sk.cms_build(tok, "w", depth=4, width=64)
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("exact_count"))
    est = sk.cms_estimate(sketch, vocab, "w", depth=4, width=64).collect()
    assert est and all(r.est_count >= r.exact_count for r in est)

    langs = [r.lang for r in d.select("lang").distinct().collect()]
    parts = [
        sk.cms_build(
            d.filter(F.col("lang") == l).select(
                F.explode(tokens(F.col("text"))).alias("w")
            ),
            "w", depth=4, width=64,
        )
        for l in langs
    ]
    merged = {
        (r.d, r.bucket): r.c for r in sk.cms_merge(*parts).collect()
    }
    direct = {(r.d, r.bucket): r.c for r in sketch.collect()}
    assert merged == direct


def test_countmin_weighted_build_matches_replicated_rows(spark):
    """cms_build(weight_col) must equal building from weight-replicated
    rows (weighted increments are exact, not approximated)."""
    from eco_pulse_lakehouse_spark.operators import sketches as sk

    rows = [("alpha", 3), ("beta", 2), ("alpha", 1), ("gamma", 5)]
    df = spark.createDataFrame(rows, "w STRING, n INT")
    weighted = {
        (r.d, r.bucket): r.c
        for r in sk.cms_build(df, "w", depth=4, width=16, weight_col="n").collect()
    }
    flat_rows = [(w,) for w, n in rows for _ in range(n)]
    flat = spark.createDataFrame(flat_rows, "w STRING")
    direct = {
        (r.d, r.bucket): r.c
        for r in sk.cms_build(flat, "w", depth=4, width=16).collect()
    }
    assert weighted == direct


def test_theta_setops_match_exact_on_fixture(spark):
    """Theta intersection/difference estimates must sit within a few
    percent of the exact set cardinalities (fixture sets are far
    below sketch capacity, so they are effectively exact)."""
    from eco_pulse_lakehouse_spark.corpus.extended import a20_theta_setops

    ev = load_table(spark, SF, "events")
    clicks = {r.user_id for r in ev.filter(F.col("event_type") == "click")
              .select("user_id").distinct().collect()}
    buys = {r.user_id for r in ev.filter(F.col("event_type") == "purchase")
            .select("user_id").distinct().collect()}
    got = a20_theta_setops(spark, SF).collect()[0]
    assert abs(got.click_and_purchase - len(clicks & buys)) <= max(
        2, 0.05 * len(clicks & buys)
    )
    assert abs(got.click_not_purchase - len(clicks - buys)) <= max(
        2, 0.05 * len(clicks - buys) if clicks - buys else 2
    )


def test_kll_merged_quantiles_close_to_exact(spark):
    """The merged KLL p50/p95 must track the exact global percentiles
    (KLL normalized error ~1.7% at default k)."""
    from eco_pulse_lakehouse_spark.corpus.extended import a21_kll_quantiles

    ev = load_table(spark, SF, "events")
    exact = ev.agg(
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
    ).collect()[0]
    got = a21_kll_quantiles(spark, SF).collect()[0]
    assert abs(got.p50_est - exact.p50) / exact.p50 <= 0.05
    assert abs(got.p95_est - exact.p95) / exact.p95 <= 0.05


def test_frequent_items_exact_even_under_heavy_collisions(spark):
    """frequent_items must equal the direct GROUP BY/HAVING for ANY
    sketch width — the CMS candidate pass can only ADD collision
    false-positives (removed by the exact recount), never drop a
    true heavy hitter. width=4 forces nearly every key to collide,
    the adversarial case for the no-false-negative guarantee."""
    from eco_pulse_lakehouse_spark.functions.text import tokens
    from eco_pulse_lakehouse_spark.operators.sketches import frequent_items

    d = load_table(spark, SF, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("w"))
    direct = {
        (r.w, r.n)
        for r in tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 500)
        .collect()
    }
    assert direct  # the fixture must exercise a non-empty answer
    for width in (4, 64, 1 << 12):
        got = {
            (r.w, r.n)
            for r in frequent_items(
                tok, "w", min_count=500, depth=4, width=width
            ).collect()
        }
        assert got == direct, f"width={width}"


def test_frequent_items_prefilter_prunes_vocabulary(spark):
    """At a sane width the candidate set entering the exact recount
    must be far smaller than the vocabulary (the point of the CMS
    pass): count candidate DISTINCT keys surviving the row-wise
    prefilter directly."""
    from eco_pulse_lakehouse_spark.operators import sketches as sk

    n, hot = 5000, 8
    df = spark.range(n).select(
        F.when(
            F.col("id") % 100 < hot, F.concat(F.lit("hot"), F.col("id") % hot)
        )
        .otherwise(F.concat(F.lit("cold"), F.col("id")))
        .alias("w")
    )
    sketch = sk.cms_build(df, "w", depth=4, width=1 << 12)
    est = sk.cms_rowwise_estimate(F.col("w"), 4, 1 << 12)
    candidates = (
        df.join(F.broadcast(sk.cms_literal_map(sketch)))
        .filter(est >= 50)
        .select("w")
        .distinct()
        .count()
    )
    vocab = df.select("w").distinct().count()
    assert candidates < vocab * 0.05  # ~8 hot keys vs ~4600 cold
    got = sk.frequent_items(df, "w", min_count=50, depth=4, width=1 << 12)
    assert got.count() == hot


def _ss_stream(spark):
    """4 units; key counts per unit chosen so per_unit_k=2 truncates
    real mass in every unit (thr > 0) while the certificate holds."""
    rows = []
    per_unit = {
        0: {"a": 9, "b": 7, "c": 3, "d": 2},
        1: {"a": 8, "b": 6, "e": 3, "c": 2},
        2: {"b": 9, "a": 5, "d": 3, "e": 1},
        3: {"a": 7, "b": 7, "c": 3, "f": 2},
    }
    for u, ks in per_unit.items():
        for key, n in ks.items():
            rows += [(u, key)] * n
    return spark.createDataFrame(rows, "unit INT, key STRING")


def test_spacesaving_topk_equals_direct_under_truncation(spark):
    from eco_pulse_lakehouse_spark.operators.sketches import (
        spacesaving_summary,
        spacesaving_topk,
    )

    df = _ss_stream(spark)
    # per_unit_k=2 really truncates: every unit drops keys with mass
    s = spacesaving_summary(df, "key", "unit", 2)
    assert all(r.thr > 0 for r in s.select("unit", "thr").distinct().collect())
    got = spacesaving_topk(df, "key", "unit", k=2, per_unit_k=2).collect()
    direct = (
        df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(2)
        .collect()
    )
    assert [(r.key, r.n) for r in got] == [(r.key, r.n) for r in direct]


def test_spacesaving_merge_is_order_insensitive(spark):
    from eco_pulse_lakehouse_spark.operators.sketches import (
        spacesaving_merge,
        spacesaving_summary,
    )

    df = _ss_stream(spark)
    s = spacesaving_summary(df, "key", "unit", 2)
    # merge the per-unit summaries in two different union orders
    parts = [s.filter(F.col("unit") == u) for u in (0, 1, 2, 3)]
    fwd = parts[0].unionByName(parts[1]).unionByName(parts[2]).unionByName(parts[3])
    rev = parts[3].unionByName(parts[1]).unionByName(parts[0]).unionByName(parts[2])
    m1 = sorted(
        (r.key, r.lower, r.upper)
        for r in spacesaving_merge(fwd, "key", "unit").collect()
    )
    m2 = sorted(
        (r.key, r.lower, r.upper)
        for r in spacesaving_merge(rev, "key", "unit").collect()
    )
    assert m1 == m2
    # bound sanity: lower <= exact <= upper for every tracked key
    exact = {
        r.key: r.n
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for key, lo, up in m1:
        assert lo <= exact[key] <= up


def test_spacesaving_strict_raises_without_exactness_certificate(spark):
    """Diffuse-key hazard: every unit tracks only its own hot key, so
    a key hidden just below every threshold could still be global
    top-k — strict mode must fail the job, not return a guess."""
    import pytest

    from eco_pulse_lakehouse_spark.operators.sketches import (
        spacesaving_topk,
    )

    rows = []
    for u, hot in enumerate(["x", "y", "x", "y"]):
        rows += [(u, hot)] * 3
        rows += [(u, f"d{u}")] * 2  # dropped at per_unit_k=1, thr=2
    df = spark.createDataFrame(rows, "unit INT, key STRING")
    with pytest.raises(Exception, match="not certifiably exact"):
        spacesaving_topk(df, "key", "unit", k=2, per_unit_k=1).collect()
    # non-strict mode returns k rows without the guarantee
    got = spacesaving_topk(
        df, "key", "unit", k=2, per_unit_k=1, strict=False
    ).collect()
    assert len(got) == 2


def test_ams_f2_linear_and_concentrated(spark):
    """AMS F2 sketch: (a) LINEARITY — per-half sketch vectors ADD to
    the full-scan sketch exactly (the mergeable-summary contract);
    (b) the mean of the 16 estimates lands in a fixed band around
    the exact self-join size Σ f_k² (everything is deterministic —
    hashes and data are fixed — so the band is a measured pin, not a
    probabilistic tolerance: ratio 1.59 at sf0.001 with 16 single
    sketches of χ²-skewed spread; swap in a 4-wise family and
    median-of-means for guaranteed bounds)."""
    from eco_pulse_lakehouse_spark.operators.sketches import (
        ams_f2_estimates,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    full = {
        r.j: r.sketch for r in ams_f2_estimates(ev, F.col("user_id")).collect()
    }
    lo = {
        r.j: r.sketch
        for r in ams_f2_estimates(
            ev.filter(F.col("event_id") % 2 == 0), F.col("user_id")
        ).collect()
    }
    hi = {
        r.j: r.sketch
        for r in ams_f2_estimates(
            ev.filter(F.col("event_id") % 2 == 1), F.col("user_id")
        ).collect()
    }
    assert {j: lo[j] + hi[j] for j in full} == full
    exact = sum(
        r.c * r.c
        for r in ev.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    )
    mean_est = sum(
        r.est_f2 for r in ams_f2_estimates(ev, F.col("user_id")).collect()
    ) / 16.0
    assert 0.5 * exact <= mean_est <= 2.5 * exact, (mean_est, exact)
