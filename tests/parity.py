"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

For each ``__spark_entry__.queries()`` entry with an
``oracle_sql()`` twin: run both at a scale factor, sort columns by
name, sort rows, and compare row-count + schema-width + exact
values. Floats are compared bit-exactly first; on mismatch the max
absolute difference is reported so we can decide whether a rounding
normalization belongs in BOTH the query and the oracle
(SURVEY.md §7.4.4).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from eco_pulse_lakehouse_spark.catalog import TABLES, table_path


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            import numpy as np

            df[c] = df[c].map(
                lambda v: tuple(v)
                if isinstance(v, (list, tuple, np.ndarray))
                else v,
                na_action="ignore",
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _num_family(s: pd.Series) -> str:
    """Classify a pandas column for the driver-mirroring dtype gate."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "nonnum"


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str

    def __repr__(self) -> str:  # pragma: no cover
        return f"[{'OK ' if self.ok else 'FAIL'}] {self.name}: {self.detail}"


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> ParityResult:
    if len(spark_pdf) != len(oracle_pdf):
        return ParityResult(
            name, False, f"row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
        )
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if [c.lower() for c in s_cols] != [c.lower() for c in o_cols]:
        return ParityResult(name, False, f"schema {s_cols} != oracle {o_cols}")
    if len(spark_pdf) == 0:
        return ParityResult(name, True, "0 rows (both)")
    s, o = _canon(spark_pdf), _canon(oracle_pdf)
    o.columns = s.columns
    for c in s.columns:
        sv, ov = s[c], o[c]
        # Dtype-family gate (VERDICT r03 item 3): the driver's value-hash
        # is dtype-sensitive, so an oracle that returns HUGEINT/DECIMAL
        # (-> pandas float64) against a Spark BIGINT fails there even when
        # every value matches. Mirror that sensitivity locally: a numeric
        # column must be int-family on BOTH sides or float-family on BOTH.
        sf_, of_ = _num_family(sv), _num_family(ov)
        if sf_ != of_ and "nonnum" not in (sf_, of_):
            return ParityResult(
                name,
                False,
                f"col {c}: dtype family mismatch spark={sv.dtype}({sf_}) "
                f"!= oracle={ov.dtype}({of_}) — cast the oracle (or query) "
                "so both sides agree (uncast SUM -> HUGEINT trap)",
            )
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv = sv.astype(float)
            ov = ov.astype(float)
            both_nan = sv.isna() & ov.isna()
            eq = (sv == ov) | both_nan
            if not eq.all():
                diff = (sv - ov).abs().max()
                n_bad = int((~eq).sum())
                return ParityResult(
                    name,
                    False,
                    f"col {c}: {n_bad} float mismatches, max |diff|={diff!r}",
                )
        else:
            def norm(v):
                import numpy as np

                if isinstance(v, (tuple, list, np.ndarray)):
                    return tuple(v)
                return None if pd.isna(v) else v

            sl = [norm(v) for v in sv.tolist()]
            ol = [norm(v) for v in ov.tolist()]
            if sl != ol:
                idx = next(i for i, (a, b) in enumerate(zip(sl, ol)) if a != b)
                return ParityResult(
                    name,
                    False,
                    f"col {c}: value mismatch e.g. row {idx}: "
                    f"{sl[idx]!r} != {ol[idx]!r}",
                )
    return ParityResult(name, True, f"{len(s)} rows x {len(s.columns)} cols exact")


def run_parity(spark, sf_dir: str, only: list[str] | None = None) -> list[ParityResult]:
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb_con(sf_dir)
    results = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            if name not in oracles:
                n = fn(spark, sf_dir).count()
                results.append(ParityResult(name, True, f"rows-only check: {n} rows"))
                continue
            spark_pdf = fn(spark, sf_dir).toPandas()
            oracle_pdf = con.execute(oracles[name]).fetchdf()
            results.append(compare(name, spark_pdf, oracle_pdf))
        except Exception as ex:  # noqa: BLE001
            results.append(ParityResult(name, False, f"EXCEPTION {type(ex).__name__}: {ex}"))
    return results
