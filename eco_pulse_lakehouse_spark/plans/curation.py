"""Composed CURATION-SELECTION pipeline — flagship #6: the
quality-selection half of a pre-training data factory, chaining the
round-7 operator families end to end (each stage individually
oracle-certified; the composition carries its own end-to-end oracle,
flagship_curation_select):

  1. EXACT DEDUP      — keep the lowest-id row per text
                        (operators/dedup.py:exact_dedup)
  2. LINE DEDUP       — CCNet keep-first over 3-token lines; docs
                        reduced to nothing are dropped
                        (dedup.py:line_dedup_keep_first)
  3. NB QUALITY GATE  — learned Naive-Bayes log-odds classifier
                        (selection.py:nb_classify), weak-labeled by
                        the curated-sources provenance split and
                        TRAINED ON THE CLEANED TEXT of this very
                        pipeline (training upstream of dedup would
                        let boilerplate dominate the class counts);
                        keep docs with non-negative evidence —
                        margin net of the class prior (VERDICT r08
                        item 2, the DCLM/FineWeb-Edu rung)
  4. DSIR SELECTION   — hashed-n-gram importance weights over the
                        GATED text (target = lang='en'), top-k
                        manifest (operators/selection.py)

Ordering matters and is the production order: dedup before any LM —
duplicated boilerplate would otherwise dominate the raw bucket
counts and drag every classifier weight and selection weight toward
the boilerplate distribution (the same reason CCNet dedups before
its perplexity filter); the classifier gates before DSIR so the
importance model fits the quality-passing pool. The output manifest
(doc_id, lang, weight_fp, n_tokens) is the hand-off to the export
recipe (flagship_training_export), which rebalances and splits
whatever this stage selected.

Scale: stages 1-2 are the dedup family's bounded shuffles, stages
3-4 are each one scan + broadcast vocab-sized tables (128-row
weights, 1-row prior) + TakeOrderedAndProject — nothing here
re-scans text more than the stage that owns it.
Reference parity: raulJD13/eco-pulse-lakehouse's curate step
(fire_risk_processor.py) is filter-only; this flagship is the
engine's superset curation path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.catalog import load_table
from eco_pulse_lakehouse_spark.functions.text import token_count
from eco_pulse_lakehouse_spark.operators.dedup import (
    exact_dedup,
    line_dedup_keep_first,
)
from eco_pulse_lakehouse_spark.operators.selection import (
    dsir_weights,
    nb_classify,
)


def curation_select(
    docs: DataFrame,
    k: int = 100,
    chunk_tokens: int = 3,
    n_buckets: int = 128,
) -> DataFrame:
    """Dedup → line-dedup → NB quality gate → DSIR top-k manifest.
    Returns (doc_id, lang, weight_fp, n_tokens) for the k selected
    docs, ordered deterministically (weight desc, doc_id asc)."""
    dd = exact_dedup(docs, ["text"], "doc_id").select(
        "doc_id", "lang", "source", "text"
    )
    ld = line_dedup_keep_first(dd, "doc_id", "text", chunk_tokens)
    cleaned = (
        dd.select("doc_id", "lang", "source")
        .join(ld.select("doc_id", "text_clean"), "doc_id")
        .filter(F.col("text_clean") != "")
        .select("doc_id", "lang", "source", F.col("text_clean").alias("text"))
    )
    gated = nb_classify(
        cleaned,
        F.col("source").isin("src0", "src1", "src2", "src3", "src4"),
        n_buckets=n_buckets,
    )
    kept = cleaned.join(
        gated.filter(F.col("evidence_fp") >= 0).select("doc_id"), "doc_id"
    )
    w = dsir_weights(
        kept, F.col("lang") == "en", n_buckets=n_buckets
    )
    return (
        w.join(kept, "doc_id")
        .select(
            "doc_id",
            "lang",
            "weight_fp",
            token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        )
        .orderBy(F.col("weight_fp").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def flagship_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation_select(load_table(spark, sf_dir, "documents"))
