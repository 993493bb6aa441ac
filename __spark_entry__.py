"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship gold-risk pipeline (SURVEY.md §7.2)
at sf0.001. ``queries()`` holds one callable per implemented operator
from SURVEY.md §2 (keys prefixed by the survey row id), each with an
ANSI-SQL DuckDB twin in ``oracle_sql()`` unless the op is not
SQL-expressible (streaming/LSH — driver then records rows-only).

Float determinism policy (SURVEY.md §7.4.4): row-level IEEE
arithmetic (+,-,*,/ on doubles) is bit-identical between Spark and
DuckDB and is left exact; order-sensitive float AGGREGATES
(sum/avg over doubles) are computed through exact DECIMAL
accumulation in BOTH engines and cast back to double, so results are
independent of partitioning / addition order at any scale.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from eco_pulse_lakehouse_spark import corpus


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from eco_pulse_lakehouse_spark.plans.gold import gold_risk_events

    return gold_risk_events(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return corpus.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible entry in ``queries()``."""
    return corpus.oracle_sql()
