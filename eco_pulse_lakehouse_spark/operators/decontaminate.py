"""Train/eval decontamination — n-gram overlap between splits
(north-star X6 adjacency; SURVEY.md §2.11).

Before training, any document that shares long word n-grams with an
evaluation set must be flagged (benchmark leakage). The reference has
no notion of this (it is a sensor lakehouse); for a training-data
engine it is a first-class pass.

Shape (the only one that survives 100 TB):

  eval side   → explode n-gram shingles → distinct        [small-ish]
  train side  → explode n-gram shingles                   [postings]
  equi-join on the shingle, count DISTINCT matched shingles per doc

Candidate generation is an equi-join on the shingle key — never a
cross product, never a scan of eval text per train doc. The eval
shingle set is benchmark-sized (millions of rows, not TB), so at
scale it broadcast-joins; the train side streams through map-side.
Skewed shingles (boilerplate) are split by AQE.

Shingles join on the raw n-gram STRING so the DuckDB oracle can
reproduce the result exactly; at 100 TB you would first map each
shingle to xxhash64 (8 bytes) exactly as operators/dedup.py's
minhash does — the join shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.functions.text import word_shingles


def _shingle_rows(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    ).distinct()


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 5,
    min_overlap: int = 1,
) -> DataFrame:
    """Flag train documents sharing ≥ ``min_overlap`` distinct word
    ``shingle_n``-grams with any eval document.

    Returns (id, n_overlap) for flagged documents — the removal list.
    The distinct() on each side bounds the join fan-out: a shingle
    repeated inside one document contributes one posting row.
    """
    eval_shingles = (
        _shingle_rows(eval_set, id_col, text_col, shingle_n)
        .select("shingle")
        .distinct()
    )
    train_shingles = _shingle_rows(train, id_col, text_col, shingle_n)
    return (
        train_shingles.join(eval_shingles, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )
