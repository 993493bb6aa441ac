"""Flagship #7 — the composed TOKENIZER pipeline.

The preprocessing chain a pre-training run actually executes between
curation and packing: CCNet perplexity buckets gate the corpus
(train on head+middle, drop the tail — Wenzek et al. 2020), a
WordPiece tokenizer trains on the KEPT text only (training the
tokenizer on the tail's noise would waste merge slots on junk
n-grams), and every kept document gets its EXACT token count under
the learned merges — the number the packing/curriculum stages
budget with. End-to-end oracle-checked: the SQL composes the shared
perplexity CTE chain with the unrolled WordPiece rounds over the
kept subset (corpus/northstar.py:flagship_tokenizer_pipeline).

Scale: the bucket gate is the distributed-rank form (no single-task
per-language sort), tokenizer training touches only the vocab-sized
(word, freq) table of the kept corpus, and the final count is one
broadcast-join + map-side-combinable groupBy per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.catalog import load_table
from eco_pulse_lakehouse_spark.functions.text import tokens
from eco_pulse_lakehouse_spark.operators.bpe import (
    learn_wordpiece_merges,
    segment_words,
)
from eco_pulse_lakehouse_spark.operators.retrieval import perplexity_buckets


def tokenizer_pipeline(
    docs: DataFrame,
    n_merges: int = 6,
    keep_buckets: int = 2,
) -> DataFrame:
    """Perplexity-gate → WordPiece train → exact per-doc counts.

    Returns (doc_id, lang, ppx_bucket, n_words, n_wp_tokens) for the
    kept (bucket ≤ ``keep_buckets``) documents."""
    b = perplexity_buckets(docs, "doc_id", "text", "lang", 3)
    keep = b.filter(F.col("ppx_bucket") <= keep_buckets).select(
        "doc_id", "lang", "ppx_bucket"
    )
    kdocs = docs.select("doc_id", "text").join(
        keep.select("doc_id"), "doc_id"
    )
    merges = [
        (r.left_sym, r.right_sym)
        for r in learn_wordpiece_merges(kdocs, "text", n_merges=n_merges)
        .orderBy("merge_round")
        .collect()
    ]
    seg = segment_words(kdocs, merges)
    tok = kdocs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("w")
    ).filter(F.length("w") > 0)
    cnt = (
        # seg is vocab-sized (distinct kept words) — pin the
        # broadcast per the repo convention rather than relying on
        # AQE's runtime promotion (VERDICT r08 nit; plan-asserted in
        # tests/test_plans.py).
        tok.join(F.broadcast(seg), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.size("seg")).cast("bigint").alias("n_wp_tokens"),
        )
    )
    return cnt.join(keep, "doc_id").select(
        "doc_id", "lang", "ppx_bucket", "n_words", "n_wp_tokens"
    )


def flagship_tokenizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "text", "lang"
    )
    return tokenizer_pipeline(d)
