"""North-star flagship: the composed training-data text pipeline.

quality gate → filter clean → exact dedup → per-language rollup of
volume / quality / fingerprint diversity. Every stage is an engine
operator (operators/quality.py, operators/dedup.py,
functions/text.py) and every stage is exact — so the WHOLE composed
pipeline is DuckDB-oracle-checkable end-to-end, not just its pieces.

At 100 TB this is one declarative plan: the gate and stats are
narrow per-row expressions fused into the scan stage, dedup is one
shuffle on the content hash, the rollup is a partial+final agg on a
5-value key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.functions import text as xt
from eco_pulse_lakehouse_spark.operators.dedup import exact_dedup
from eco_pulse_lakehouse_spark.operators.quality import split

MIN_TOKENS = 20
MAX_STOP_RATIO = 0.5


def curate_documents(docs: DataFrame) -> DataFrame:
    """Per-language curation summary of the cleaned, deduped corpus."""
    rules = {
        "min_tokens": xt.token_count(F.col("text")) >= MIN_TOKENS,
        "stop_ratio": xt.stopword_ratio(F.col("text")) < MAX_STOP_RATIO,
    }
    clean, _quarantine = split(docs, rules)
    unique = exact_dedup(clean, ["text"], "doc_id")
    scored = unique.select(
        "doc_id",
        "lang",
        xt.quality_score(F.col("text")).alias("q"),
        xt.fingerprint(F.col("text")).alias("fp"),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("q").cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_quality"),
        F.countDistinct("fp").alias("distinct_fingerprints"),
    )
