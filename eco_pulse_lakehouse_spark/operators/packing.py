"""Sequence packing — concatenate documents into context-length bins.

The last mile of an LLM data pipeline: documents are packed into
fixed-token-budget training sequences. Exact global bin packing is
NP-hard and inherently sequential; the production form is SHARDED
GREEDY packing — shard documents by a deterministic key, order within
the shard, and fill bins first-fit-sequentially. Shards pack in
parallel (one Arrow group each); the sequential scan is per-shard,
so wall-clock scales with 1/num_shards and no shard's documents ever
leave its task.

Greedy-sequential is deterministic given (shard, order), which makes
it oracle-checkable: DuckDB replays the identical fold with a
recursive CTE (corpus/northstar.py:x7_pack_documents) — an exact
value check for an iterative, non-relational operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_documents(
    docs: DataFrame,
    id_col: str,
    token_col: str,
    capacity: int,
    num_shards: int = 8,
) -> DataFrame:
    """Greedy sequential packing of (id, token_count) rows into bins
    of ``capacity`` tokens, sharded by ``id % num_shards`` and ordered
    by id within the shard.

    A document larger than ``capacity`` gets a bin of its own (it
    would be truncated/split downstream); the next document always
    starts a fresh bin after an overflow. Returns one row per bin:
    (shard, bin, n_docs, total_tokens, first_doc, last_doc).
    """

    def pack(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("__id")
            bins, used = [], None
            bin_id = -1
            for tok in pdf["__tok"].values:
                if used is None or used + tok > capacity:
                    bin_id += 1
                    used = 0
                used += int(tok)
                bins.append(bin_id)
            pdf = pdf.assign(__bin=bins)
            out = (
                pdf.groupby("__bin")
                .agg(
                    shard=("__shard", "first"),
                    n_docs=("__id", "size"),
                    total_tokens=("__tok", "sum"),
                    first_doc=("__id", "min"),
                    last_doc=("__id", "max"),
                )
                .reset_index()
                .rename(columns={"__bin": "bin"})
            )
            yield out[
                ["shard", "bin", "n_docs", "total_tokens", "first_doc", "last_doc"]
            ]

    prepared = docs.select(
        F.col(id_col).cast("bigint").alias("__id"),
        F.col(token_col).cast("bigint").alias("__tok"),
        F.pmod(F.col(id_col).cast("bigint"), F.lit(num_shards)).alias("__shard"),
    )
    return prepared.groupBy("__shard").applyInPandas(
        pack,
        "shard BIGINT, bin BIGINT, n_docs BIGINT, total_tokens BIGINT, "
        "first_doc BIGINT, last_doc BIGINT",
    )
