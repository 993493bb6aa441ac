"""SQL-catalog ergonomics: create_silver_database registers managed
(bucketed) tables usable via USE eco_pulse / qualified SQL, and the
bucket layout makes the fact-fact join zero-exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.catalog import (
    create_silver_database,
    load_table,
)

SF = "/root/testdata/sf0.001"


def test_database_tables_and_zero_exchange_join(spark):
    create_silver_database(spark, SF, db_name="eco_pulse_t", buckets=4)

    tables = {t.name for t in spark.catalog.listTables("eco_pulse_t")}
    assert {"lineitem", "orders", "customer", "region"} <= tables

    spark.sql("USE eco_pulse_t")
    try:
        n = spark.sql("SELECT COUNT(*) AS n FROM lineitem").first().n
        assert n == load_table(spark, SF, "lineitem").count()

        # bucket-aligned fact-fact join: no Exchange in the plan
        # (disable broadcast so the bucketed path is actually chosen)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.sql(
                """
                SELECT l.l_orderkey, o.o_totalprice
                FROM lineitem l JOIN orders o
                  ON l.l_orderkey = o.o_orderkey
                """
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() > 0
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("USE default")


def test_database_is_rerunnable(spark):
    create_silver_database(spark, SF, db_name="eco_pulse_t2", buckets=4)
    create_silver_database(spark, SF, db_name="eco_pulse_t2", buckets=4)
    n = spark.sql("SELECT COUNT(*) AS n FROM eco_pulse_t2.orders").first().n
    assert n == load_table(spark, SF, "orders").count()
