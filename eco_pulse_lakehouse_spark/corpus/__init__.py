"""Operator-parity corpus (SURVEY.md §5.2).

Each submodule registers named queries (Spark callables over
``(spark, sf_dir)``) and, for every SQL-expressible one, a DuckDB
oracle twin. The driver — and tests/test_oracle_parity.py locally —
runs both sides and compares row-count + schema + values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from eco_pulse_lakehouse_spark.corpus import (
    extended,
    northstar,
    relational,
    streaming_corpus,
    tpch,
)

_MODULES = (relational, extended, tpch, northstar, streaming_corpus)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate corpus query names: {overlap}")
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
