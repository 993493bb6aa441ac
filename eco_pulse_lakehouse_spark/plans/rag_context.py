"""Composed RAG CONTEXT-BUILDER — retrieval serving as ONE call,
chaining the engine's retrieval + dedup + budgeting operators (each
individually oracle-certified; the composition carries its own
end-to-end oracle, flagship_rag_context):

  1. RETRIEVE      — int8-quantized exact BIGINT dot top-k per query
                     (operators/similarity.py:quantized_dot_topk —
                     the oracle-exact scoring stage; swap in
                     ivf_topk/cosine_topk_lsh for candidate
                     generation at scale, same downstream shape)
  2. CONTEXT DEDUP — drop a retrieved doc whose word-3-gram
                     CONTAINMENT vs ANY higher-ranked retrieved doc
                     for the same query crosses the threshold (the
                     "don't stuff near-identical passages in the
                     prompt" step; containment catches doc-in-doc
                     overlap Jaccard dilutes — x2_containment)
  3. TOKEN BUDGET  — running whitespace-token total over rank order;
                     keep docs while the cumulative count fits

Exactness: dots are BIGINT, the containment threshold compares
integers (den·|∩| ≥ num·min — never a float boundary), token counts
and the running budget are BIGINT sums — the whole composition
replays bit-for-bit in SQL.

Scale: per-query work is k² containment pairs over k retrieved docs
(k is the serving constant, ~8-50) after a candidate-bounded
retrieval — every join is q_id-equi or doc-id-equi; nothing is
corpus-quadratic. The dedup rule is "dup of any higher-ranked
RETRIEVED doc" (not transitively re-kept like sequential MMR) so the
verdict is a pure pairwise predicate — deterministic, order-free,
and SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rag_context(
    embeddings: DataFrame,
    docs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    n_queries: int = 5,
    k: int = 8,
    shingle_n: int = 3,
    containment_num: int = 6,
    containment_den: int = 10,
    token_budget: int = 800,
) -> DataFrame:
    """Build the final per-query context table:
    (q_id, rk, doc_id, n_tokens, cum_tokens) — retrieved, deduped,
    budget-trimmed, in rank order. Containment threshold is the
    rational ``containment_num / containment_den`` (default 0.6),
    compared in integers."""
    from eco_pulse_lakehouse_spark.functions.text import (
        token_count,
        word_shingles,
    )
    from eco_pulse_lakehouse_spark.operators.similarity import (
        quantize_embeddings,
        quantized_dot_topk,
    )

    qz = quantize_embeddings(embeddings, vec_col, "q_vec")
    qs = qz.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("q_id"), F.col("q_vec").alias("qa")
    )
    cs = qz.select(F.col(id_col).alias("c_id"), F.col("q_vec").alias("qb"))
    retrieved = quantized_dot_topk(
        qs, cs, k=k, q_vec="qa", c_vec="qb"
    ).select("q_id", "c_id", "rk")
    sh = retrieved.join(
        docs.select(
            F.col(doc_id_col).alias("c_id"),
            F.array_distinct(
                word_shingles(F.col(text_col), shingle_n)
            ).alias("__sh"),
            token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
        ),
        "c_id",
    )
    a = sh.select(
        F.col("q_id"), F.col("rk").alias("__rk_a"), F.col("__sh").alias("__sh_a")
    )
    b = sh.select(
        F.col("q_id"), F.col("c_id"), F.col("rk").alias("__rk_b"),
        F.col("__sh").alias("__sh_b"),
    )
    inter = F.size(F.array_intersect(F.col("__sh_a"), F.col("__sh_b")))
    mn = F.least(F.size("__sh_a"), F.size("__sh_b"))
    dups = (
        a.join(b, "q_id")
        .filter(F.col("__rk_a") < F.col("__rk_b"))
        .filter(
            (mn > 0)
            & (
                F.lit(int(containment_den)) * inter
                >= F.lit(int(containment_num)) * mn
            )
        )
        .select("q_id", "c_id")
        .distinct()
    )
    kept = sh.join(dups, ["q_id", "c_id"], "left_anti")
    w = (
        Window.partitionBy("q_id")
        .orderBy(F.col("rk").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        kept.withColumn(
            "cum_tokens", F.sum("n_tokens").over(w).cast("bigint")
        )
        .filter(F.col("cum_tokens") <= token_budget)
        .select(
            "q_id",
            F.col("rk").cast("int").alias("rk"),
            F.col("c_id").alias("doc_id"),
            "n_tokens",
            "cum_tokens",
        )
    )
