"""Term-relevance / vocabulary operators — inverted-index shaped
(north-star X4 adjacency: the keyword-side retrieval a curation
pipeline runs next to embedding ANN; SURVEY.md §2.11).

The reference has no retrieval layer at all (its only text handling
is Streamlit display, /root/reference/src/visualization/app.py); a
training-data engine needs term statistics for quality filtering,
keyword search, and vocabulary budgeting. Everything here is the
classic inverted-index decomposition:

  explode(tokens) → (doc, term) partial counts   [map-side combine]
  → per-term document frequency                   [vocabulary-sized]
  → broadcast the term table back onto postings   [no fact shuffle]

Scale: the only shuffles carry (doc_id, term, count) rows — never
document payloads — and the per-term side (document frequency, the
vocabulary) is vocabulary-sized, i.e. tiny relative to the corpus,
so the join back onto postings is a broadcast. That is the shape
that survives 100 TB: shuffle volume is O(postings), per-executor
state is O(vocabulary).

Parity note: idf uses ln(), which is NOT bit-identical between JVM
Math.log and DuckDB's libm (~1% of values differ by 1 ulp —
measured); scores are therefore rounded to 6 decimals on both sides
(rounding irrationals never straddles a .5 boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.functions.text import tokens


def term_postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, term, tf) postings — explode then count. The explode is
    map-local; the groupBy is the one shuffle and carries short rows."""
    return (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_topk_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf,
    idf = ln(N/df), deterministic tiebreak on the term string.

    Two aggregations (postings, then document frequency — the second
    input is already one row per (doc, term), so df is a cheap
    re-aggregation), a broadcast join of the vocabulary-sized df
    table, and one ranking window partitioned by document. Scores are
    rounded to 6 decimals for cross-engine reproducibility (ln is
    1-ulp unstable across libm implementations).
    """
    postings = term_postings(docs, id_col, text_col)
    n_docs = docs.select(
        F.count(F.lit(1)).cast("double").alias("__n_docs")
    )
    df_t = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    scored = (
        postings.join(F.broadcast(df_t), "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("__n_docs") / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(
            id_col,
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            "score",
            F.col("term_rank").cast("bigint").alias("term_rank"),
        )
    )


def vocab_coverage(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 20,
) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus top-V
    vocabulary (by global token count, ties broken by token string).

    The vocabulary-budgeting op: pick V, measure what fraction of
    each document's tokens fall outside the top-V list. The vocab is
    built with a two-phase aggregate (partial counts map-side, then a
    global top-V — V rows), broadcast back onto the exploded tokens.
    OOV rate is an exact rational (count / count): no float drift.
    """
    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    # orderBy+limit plans as TakeOrderedAndProject: per-partition
    # top-V then a V-row merge on the driver — never a global sort.
    vocab = (
        counts.orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(vocab_size)
        .select("term", F.lit(1).alias("__in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.count(F.lit(1)) - F.count("__in_vocab")).alias("n_oov"),
        )
        .withColumn(
            "oov_rate",
            F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
        )
    )
