"""Data-quality gate — expectation checks with quarantine split.

A training-data pipeline's first stage after ingest: declare
expectations as named boolean column expressions, annotate every row
with its violations, and split the stream into (good, quarantined).
Pure column expressions — one pass, no UDFs, streaming-safe (the
silver path can interpose this between parse and sink).

The reference has no dead-letter handling at all (malformed JSON
becomes silent all-NULL rows — SURVEY.md §1.3); this operator is the
engine's answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VIOLATIONS_COL = "violations"


def annotate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Add an array column naming every violated rule (empty = clean).
    ``rules`` maps rule name -> boolean Column that is TRUE when the
    row PASSES. NULL predicate results count as violations."""
    checks = [
        F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
        for name, pred in rules.items()
    ]
    return df.withColumn(
        VIOLATIONS_COL,
        F.array_compact(F.array(*checks)).cast("array<string>"),
    )


def split(df: DataFrame, rules: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) — quarantined rows keep their violation
    list for triage."""
    annotated = annotate(df, rules)
    good = annotated.filter(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    bad = annotated.filter(F.size(VIOLATIONS_COL) > 0)
    return good, bad
