"""The correctness gate, locally: every corpus query vs its DuckDB oracle.

Mirrors the driver's CORRECTNESS check (row-count + schema + exact
values at sf0.01; rows-only for entries without an oracle).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.parity import duckdb_con, compare

SF = "/root/testdata/sf0.01"

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_parity(name, spark, con):
    fn = _QUERIES[name]
    if name not in _ORACLES:
        n = fn(spark, SF).count()
        assert n >= 0
        return
    spark_pdf = fn(spark, SF).toPandas()
    oracle_pdf = con.execute(_ORACLES[name]).fetchdf()
    res = compare(name, spark_pdf, oracle_pdf)
    assert res.ok, res.detail


def test_dtype_gate_catches_uncast_hugeint():
    """The driver's value-hash is dtype-sensitive; compare() must
    fail locally when an oracle SUM comes back float64 (DuckDB
    HUGEINT) against a Spark BIGINT even if every value matches —
    the bug class behind w7_sessionize/tpch_q12 (VERDICT r03)."""
    import pandas as pd

    s = pd.DataFrame({"k": ["a", "b"], "v": pd.array([5, 6], dtype="int64")})
    o = pd.DataFrame({"k": ["a", "b"], "v": [5.0, 6.0]})
    res = compare("trap", s, o)
    assert not res.ok and "dtype family" in res.detail
    # identical families still pass
    assert compare("ok", s, s.copy()).ok


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
