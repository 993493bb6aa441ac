"""TPC-H-style OLAP corpus over the synthetic star schema, phrased
through the SQL API (``spark.sql`` over registered views) — Catalyst
produces the same plans as the DataFrame phrasings, and the judge
gets classic decision-support coverage: scan-heavy aggregation (Q1),
selective-filter revenue (Q6), multi-way join top-k (Q3-ish), 5-way
star join rollup (Q5-ish).

Column set is the driver's schema (TESTDATA.md), so predicates are
adapted; sums run through exact DECIMAL per the engine's float-
determinism policy (corpus/_registry.py:dec_sum).
"""

from __future__ import annotations

from eco_pulse_lakehouse_spark.catalog import register_views
from eco_pulse_lakehouse_spark.corpus._registry import make_registry

QUERIES, ORACLES, q = make_registry()


def _sql(spark, sf_dir: str, query: str):
    register_views(spark, sf_dir)
    return spark.sql(query)


_Q1 = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


@q("tpch_q1", _Q1)
def tpch_q1(spark, sf_dir):
    """Q1 pricing summary — scan + 2-key hash agg with 7 aggregates;
    partial (map-side) aggregation carries the whole reduction."""
    return _sql(spark, sf_dir, _Q1)


_Q6 = """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@q("tpch_q6", _Q6)
def tpch_q6(spark, sf_dir):
    """Q6 forecast revenue — every predicate pushes into the parquet
    scan; the answer is one map-side-combined sum."""
    return _sql(spark, sf_dir, _Q6)


_Q3 = """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
             AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > TIMESTAMP '1996-06-30'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
"""


@q("tpch_q3", _Q3)
def tpch_q3(spark, sf_dir):
    """Q3-style shipping-priority top-k — selective dim filter,
    two shuffle joins, decimal-exact revenue so the top-10 ordering
    is engine-independent (tiebreak on l_orderkey)."""
    return _sql(spark, sf_dir, _Q3)


_Q4 = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o.o_orderkey
                    AND l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
"""


@q("tpch_q4", _Q4)
def tpch_q4(spark, sf_dir):
    """Q4-style order-priority check — correlated EXISTS, decorrelated
    by Catalyst into a left-semi join (no per-row subquery execution)."""
    return _sql(spark, sf_dir, _Q4)


_QSCALAR = """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice >
      (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
              / COUNT(*) * 1.5
       FROM orders)
"""


@q("tpch_scalar_subquery", _QSCALAR)
def tpch_scalar_subquery(spark, sf_dir):
    """Scalar subquery in a predicate (evaluated once, broadcast into
    the filter); the threshold is decimal-exact so the boundary
    comparison is engine-independent."""
    return _sql(spark, sf_dir, _QSCALAR)


_Q10 = """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-06-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
"""


@q("tpch_q10", _Q10)
def tpch_q10(spark, sf_dir):
    """Q10-style returned-item losses — fact-side filter, 3 joins,
    top-20 customers by decimal-exact revenue."""
    return _sql(spark, sf_dir, _Q10)


_Q12 = """
    SELECT o_orderpriority,
           SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS returned_count,
           SUM(CASE WHEN l_returnflag != 'R' THEN 1 ELSE 0 END) AS kept_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
"""


@q("tpch_q12", _Q12)
def tpch_q12(spark, sf_dir):
    """Q12-style bucketed counts — CASE aggregation over a join
    (conditional counting pivots without a pivot)."""
    return _sql(spark, sf_dir, _Q12)


_Q18 = """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 120
    )
    GROUP BY o.o_orderkey, o.o_custkey, o.o_totalprice
"""


@q("tpch_q18", _Q18)
def tpch_q18(spark, sf_dir):
    """Q18-style large-quantity orders — IN-subquery with HAVING over
    a decimal-exact sum (boundary comparison engine-independent),
    rewritten by Catalyst into a semi join."""
    return _sql(spark, sf_dir, _Q18)


_Q5 = """
    SELECT r_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
             AS revenue,
           COUNT(DISTINCT o_orderkey) AS n_orders
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY r_name, n_name
"""


@q("tpch_q5", _Q5)
def tpch_q5(spark, sf_dir):
    """Q5-style regional revenue — 5-way star join: two broadcast dims
    (region, nation), shuffle joins on the fact chain, rollup by
    geography."""
    return _sql(spark, sf_dir, _Q5)
