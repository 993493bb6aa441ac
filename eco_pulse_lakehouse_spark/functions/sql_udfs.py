"""SQL UDF registration — the pure-SQL user surface.

Spark 4 SQL scalar functions (``CREATE FUNCTION ... RETURN <expr>``,
SPARK-28307) let SQL-only users call the engine's column expressions
without touching Python. Each body is a plain Catalyst expression —
inlined into the calling plan at analysis time, codegen'd like any
built-in, NO Python round-trip (unlike ``spark.udf.register``) — so
the registered form has identical 100 TB behaviour to the Column
form in :mod:`eco_pulse_lakehouse_spark.functions`.

Equivalence with the Column implementations is pinned in
``tests/test_pipeline_ops.py``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, return type, body). Bodies restricted to ANSI-ish
# expressions so the DuckDB oracles can replay them inline.
SQL_UDFS: dict[str, tuple[str, str, str]] = {
    # Knuth multiplicative unit hash (operators/sampling.py:unit_hash)
    "eco_unit_hash": (
        "(id BIGINT)",
        "DOUBLE",
        "CAST(pmod(id * 2654435761, 4294967296) AS DOUBLE) / 4294967296.0",
    ),
    # metric severity chain (corpus f_case_when_chain thresholds)
    "eco_level": (
        "(value DOUBLE)",
        "STRING",
        """CASE WHEN value >= 150.0 THEN 'EXTREME'
                WHEN value >= 100.0 THEN 'VERY_HIGH'
                WHEN value >= 50.0 THEN 'HIGH'
                WHEN value >= 10.0 THEN 'MODERATE'
                ELSE 'LOW' END""",
    ),
    # BPE-ish subword estimate (functions/text.py:bpe_ish_token_count)
    "eco_bpe_tokens": (
        "(text STRING)",
        "BIGINT",
        "aggregate(split(text, ' '), CAST(0 AS BIGINT), "
        "(acc, t) -> acc + CAST(ceil(length(t) / 4.0) AS BIGINT))",
    ),
    # great-circle km (functions/scalar.py:haversine_km)
    "eco_haversine_km": (
        "(lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE)",
        "DOUBLE",
        """2 * 6371.0088 * asin(sqrt(
             pow(sin(radians(lat2 - lat1) / 2), 2)
             + cos(radians(lat1)) * cos(radians(lat2))
               * pow(sin(radians(lon2 - lon1) / 2), 2)))""",
    ),
}


def register_sql_udfs(spark: SparkSession) -> list[str]:
    """Idempotently register every engine SQL UDF; returns the names."""
    for name, (sig, ret, body) in SQL_UDFS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body}"
        )
    return list(SQL_UDFS)
