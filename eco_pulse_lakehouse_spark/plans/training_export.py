"""Composed TRAINING-DATA EXPORT manifest — the full curation recipe
as ONE call, chaining the engine's data-pipeline operators end to
end (each stage individually oracle-certified; the composition
carries its own end-to-end oracle, flagship_training_export):

  1. EXACT DEDUP       — keep the lowest-id row per text
                         (operators/dedup.py:exact_dedup)
  2. EVAL HOLD-OUT     — Knuth unit hash splits off the eval slice
  3. DECONTAMINATION   — drop train docs sharing any word 4-gram
                         with the hold-out
                         (operators/decontaminate.py:decontaminate)
  4. TEMPERATURE MIX   — n^0.5 language rebalance over the CLEAN
                         corpus (operators/sampling.py:
                         temperature_mixture_sample)
  5. TRAIN/VAL SPLIT   — deterministic hash split of survivors
  6. TOKEN BUDGETS     — whitespace + BPE-ish counts per doc
                         (functions/text.py)

Hash INDEPENDENCE across stages: every selection thresholds a
multiplicative unit hash of the id, so reusing the SAME hash would
CORRELATE the stages (the mixture would sample from an interval the
hold-out split already truncated). Additive salting does NOT fix
this — unit_hash(id + c) = frac(unit_hash(id) + c·K/2³²) is a pure
rotation of the same draw (round-3 advisor finding: with the old
prime salts the val arc [0.9186, 0.9686) sat entirely inside the
eval hold-out u ≥ 0.9, so 'val' could never be emitted, and the
mixture keep-arc capped every domain at ~0.12). Each stage instead
uses a genuinely DIFFERENT odd multiplier (xxhash32's public
primes), giving a different bijection of Z/2³² — independent-looking
uniform draws, still layout/retry-invariant and exactly replayable
in SQL.

Everything is row-local predicates + the operators' own bounded
shuffles; at 100 TB the manifest (doc_id, lang, split, token
counts) is the hand-off artifact the tokenizer/packer consumes
(x7_pack_documents picks up from here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.operators.sampling import MULT_B, MULT_C

MIX_MULT = MULT_B    # temperature-mixture stage multiplier
SPLIT_MULT = MULT_C  # train/val-split stage multiplier


def export_manifest(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "lang",
    k_budget: int = 150,
    alpha: float = 0.5,
    shingle_n: int = 4,
    eval_frac: float = 0.1,
    val_frac: float = 0.05,
) -> DataFrame:
    """Run the six-stage export recipe; returns the manifest
    (id, domain, split ∈ {train, val}, n_tokens_ws, n_tokens_bpe)
    for every surviving document."""
    from eco_pulse_lakehouse_spark.functions.text import (
        bpe_ish_token_count,
        token_count,
    )
    from eco_pulse_lakehouse_spark.operators.decontaminate import (
        decontaminate,
    )
    from eco_pulse_lakehouse_spark.operators.dedup import exact_dedup
    from eco_pulse_lakehouse_spark.operators.sampling import (
        temperature_mixture_sample,
        unit_hash,
    )

    deduped = exact_dedup(
        docs.select(id_col, domain_col, text_col), [text_col], id_col
    )
    u = unit_hash(F.col(id_col))
    hold_out = deduped.filter(u >= 1.0 - eval_frac)
    train0 = deduped.filter(u < 1.0 - eval_frac)
    flagged = decontaminate(
        train0, hold_out, id_col, text_col, shingle_n=shingle_n
    ).select(id_col)
    clean = train0.join(flagged, id_col, "left_anti")
    mixed = temperature_mixture_sample(
        clean,
        id_col,
        domain_col,
        k=k_budget,
        alpha=alpha,
        mult=MIX_MULT,
    )
    split = F.when(
        unit_hash(F.col(id_col), mult=SPLIT_MULT) < F.lit(val_frac),
        F.lit("val"),
    ).otherwise(F.lit("train"))
    return mixed.select(
        id_col,
        domain_col,
        split.alias("split"),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens_ws"),
        bpe_ish_token_count(F.col(text_col)).alias("n_tokens_bpe"),
    )
