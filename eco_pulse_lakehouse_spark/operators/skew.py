"""Skew mitigation: salting for hot keys — the manual fallback when
AQE's skew-join splitting isn't enough (SURVEY.md scale notes).

AQE (on by default in session.py) splits skewed SHUFFLE partitions
at runtime; salting is still needed for (a) skewed AGGREGATIONS with
expensive per-group state and (b) engines/paths where AQE can't
rewrite (e.g. stream-static joins).

Pattern: two-phase aggregate — salt the key with a deterministic
hash-derived shard, partial-aggregate on (key, salt), then final-
aggregate on key. Results identical to the unsalted plan for any
associative aggregate; shuffle pressure per reducer drops by the
salt factor.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int, salt_col: str = "__salt",
              deterministic_by: str | None = None) -> DataFrame:
    """Add a salt shard column. With ``deterministic_by`` the salt is
    a hash of that column (stable across retries — required for
    exactly-once sinks); otherwise a uniform random shard."""
    if deterministic_by is not None:
        salt = F.pmod(F.xxhash64(F.col(deterministic_by)), F.lit(salt_buckets))
    else:
        salt = (F.rand() * salt_buckets).cast("int")
    return df.withColumn(salt_col, salt)


def salted_count(
    df: DataFrame,
    keys: Sequence[str],
    salt_buckets: int = 16,
    tiebreak: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe count per key: count per (key, salt) then
    sum per key. Bit-identical to ``groupBy(keys).count()``."""
    salted = with_salt(df, salt_buckets, deterministic_by=tiebreak or keys[0])
    partial = salted.groupBy(*keys, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(*keys).agg(F.sum("__c").alias("n"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 8,
    tiebreak: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (skewed) fact side into
    ``salt_buckets`` shards, replicate the dim side once per shard,
    join on (key, salt). A hot fact key spreads over ``salt_buckets``
    reducers instead of melting one. Output identical to the plain
    join; cost is dim × salt_buckets replication — use when the dim
    is small-ish but too big (or the key too hot) for broadcast.
    AQE's skew-join split covers most cases; this is the manual form
    for paths AQE can't rewrite (e.g. stream-static joins).

    Inner/left_semi/left_anti/left only: the dim side is replicated
    × salt_buckets, so 'right'/'full' would emit each unmatched dim
    row once per salt shard."""
    if how not in ("inner", "left", "left_semi", "left_anti", "semi", "anti", "leftsemi", "leftanti", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join cannot express how={how!r}: the salt-replicated "
            "dim side duplicates unmatched right rows x salt_buckets"
        )
    salt = F.pmod(F.xxhash64(F.col(tiebreak or fact_key)), F.lit(salt_buckets))
    fact_s = fact.withColumn("__salt", salt)
    dim_s = dim.withColumn(
        "__dsalt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return fact_s.join(
        dim_s,
        (F.col(fact_key) == F.col(dim_key)) & (F.col("__salt") == F.col("__dsalt")),
        how,
    ).drop("__salt", "__dsalt")


def salted_decimal_sum(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    out_name: str,
    salt_buckets: int = 16,
    scale: int = 4,
    tiebreak: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe SUM through exact decimal accumulation —
    decimal addition is associative, so the salted two-phase result
    is bit-identical to the single-phase plan (doubles would not be)."""
    dec = value.cast(f"decimal(18,{scale})")
    salted = with_salt(df, salt_buckets, deterministic_by=tiebreak or keys[0])
    partial = salted.groupBy(*keys, "__salt").agg(F.sum(dec).alias("__s"))
    return partial.groupBy(*keys).agg(
        F.sum("__s").cast("double").alias(out_name)
    )
