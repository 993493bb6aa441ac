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


def eval_shingle_set(
    eval_set: DataFrame, id_col: str, text_col: str, shingle_n: int = 5
) -> DataFrame:
    """The pinned decontamination artifact: the eval split's DISTINCT
    word ``shingle_n``-gram set (one ``shingle`` column) — built once
    and broadcast/pinned so an INGEST pipeline (t45) screens every
    arriving batch against it without re-shingling the benchmark."""
    return (
        _shingle_rows(eval_set, id_col, text_col, shingle_n)
        .select("shingle")
        .distinct()
    )


def decontaminate_against(
    train: DataFrame,
    eval_shingles: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 5,
    min_overlap: int = 1,
) -> DataFrame:
    """The train-side stage of :func:`decontaminate`, split out so a
    streaming twin screens each batch against a PREBUILT
    :func:`eval_shingle_set` — per-doc results depend only on that
    doc and the eval set, so disjoint batches union losslessly."""
    train_shingles = _shingle_rows(train, id_col, text_col, shingle_n)
    return (
        train_shingles.join(eval_shingles, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


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
    return decontaminate_against(
        train,
        eval_shingle_set(eval_set, id_col, text_col, shingle_n),
        id_col,
        text_col,
        shingle_n,
        min_overlap,
    )


def semantic_decontaminate(
    train: DataFrame,
    evalset: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "q_vec",
    min_dot: int = 4800,
) -> DataFrame:
    """EMBEDDING-space decontamination — flag training examples whose
    embedding is close to ANY evaluation example. The lexical pass
    above misses paraphrased leakage (a benchmark question reworded
    shares no 4-gram); this is its semantic twin, the pairing every
    serious eval-hygiene pipeline runs (n-gram AND embedding
    overlap).

    Shape: eval sets are benchmark-sized (thousands–millions of
    rows), so the eval side BROADCASTS and the scan over training
    embeddings is map-only — a broadcast nested-loop the optimizer
    can't beat here because similarity is not an equi-predicate; at
    larger eval sizes compose with semantic_dedup's clustering to
    bucket both sides first. Scoring is the exact BIGINT dot product
    over int8-quantized vectors (operators/similarity.py:
    quantize_embeddings), so flags are bit-reproducible across
    engines/partitionings and the corpus oracle replays them
    exactly. Returns flagged train ids with hit count and max dot
    (cos ≈ dot/127²)."""
    ev = evalset.select(
        F.col(id_col).alias("__e_id"), F.col(vec_col).alias("__e_v")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col(vec_col), F.col("__e_v"),
            lambda x, y: x.cast("bigint") * y.cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        train.crossJoin(F.broadcast(ev))
        .withColumn("__d", dot)
        .filter(F.col("__d") >= F.lit(min_dot))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_eval_hits"),
            F.max("__d").alias("max_dot"),
        )
    )
