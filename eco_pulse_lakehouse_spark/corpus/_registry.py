"""Tiny registration helper shared by corpus modules."""

from __future__ import annotations

from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.catalog import load_table as T  # noqa: F401


def make_registry():
    queries: dict = {}
    oracles: dict[str, str] = {}

    def q(name: str, oracle: str | None = None):
        def deco(fn):
            if name in queries:
                raise ValueError(f"duplicate corpus name {name}")
            queries[name] = fn
            if oracle is not None:
                oracles[name] = oracle
            return fn

        return deco

    return queries, oracles, q


def dec_sum(col, alias: str, scale: int = 4):
    """Order-independent float sum: exact DECIMAL accumulation, cast back.

    Spark partial aggregation adds doubles in partition order, which is
    nondeterministic at scale; decimal accumulation is exact so the
    result is stable AND matches the DuckDB oracle bit-for-bit. The
    oracle twin is ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``.
    """
    c = col if not isinstance(col, str) else F.col(col)
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def o_dec_sum(expr: str, alias: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


def dec_avg(col, alias: str, scale: int = 4):
    """Order-independent mean: exact decimal sum divided by count."""
    c = col if not isinstance(col, str) else F.col(col)
    return (
        F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
        / F.count(c)
    ).alias(alias)


def o_dec_avg(expr: str, alias: str, scale: int = 4) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
