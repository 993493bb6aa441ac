"""Upsert / MERGE and incremental maintenance — SURVEY.md §4.2.

The reference maintains its gold table by overwriting the world
every 60 s (``gold_batch_job.py:83-101``) — O(all-data) per minute.
The scalable replacement is incremental MERGE: with Delta on the
classpath that is ``DeltaTable.merge``; in this image the same
semantics are emulated relationally (anti-join + union), which is
also exactly how you reason about MERGE's result for testing.

At 100 TB: partition the target by a pruning key (date/region) and
merge only touched partitions — ``upsert`` is a pure DataFrame
transform, so callers control the write granularity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    target: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """MERGE semantics: rows of ``updates`` win on key collision
    (whenMatchedUpdateAll), unmatched target rows survive, unmatched
    update rows insert (whenNotMatchedInsertAll).

    updates ∪ (target ⟕anti updates): one shuffle-or-broadcast
    anti-join on the keys.
    """
    kept = target.join(updates.select(*keys).distinct(), on=list(keys), how="left_anti")
    return updates.unionByName(kept)


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out current rows that
    have a newer change (set valid_to) and append the new versions.
    ``current`` must carry valid_from/valid_to columns; ``changes``
    carries ``ts_col`` as the new valid_from.

    Multiple changes for one key in a single batch chain correctly:
    each appended version is closed by the NEXT change's valid_from
    (lead over the per-key change sequence); only the latest change
    stays open, and the pre-existing current row closes at the
    earliest change ts. One window shuffle on the keys.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    ch = (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .drop(ts_col)
    )
    first_change = ch.groupBy(*keys).agg(F.min("valid_from").alias("__new_from"))
    closed = (
        current.join(first_change, on=list(keys), how="left")
        .withColumn(
            "valid_to",
            F.when(
                F.col("valid_to").isNull() & F.col("__new_from").isNotNull(),
                F.col("__new_from"),
            ).otherwise(F.col("valid_to")),
        )
        .drop("__new_from")
    )
    return closed.unionByName(ch, allowMissingColumns=False)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Change-data capture between two table snapshots: one full
    outer join on the keys classifying every row as
    insert / delete / update (unchanged rows are dropped). The CDC
    feed a Delta CHANGE DATA FEED would give, derived from plain
    snapshots — one co-partitioned shuffle on the key columns.

    Presence on each side is tracked with marker columns (not value
    nullability) and values compare null-safely (``eqNullSafe``), so
    NULL-valued compare columns neither mask changes nor fake
    deletes. Output: key columns + ``change_type`` + old_/new_
    prefixed compare columns.
    """
    compare_cols = list(
        compare_cols
        if compare_cols is not None
        else [c for c in new.columns if c not in keys]
    )
    j = (
        old.select(*keys, *[F.col(c).alias(f"old_{c}") for c in compare_cols])
        .withColumn("__old", F.lit(1))
        .join(
            new.select(
                *keys, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
            ).withColumn("__new", F.lit(1)),
            on=list(keys),
            how="full_outer",
        )
    )
    changed = None
    for c in compare_cols:
        neq = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        changed = neq if changed is None else (changed | neq)
    ct = (
        F.when(F.col("__old").isNull(), "insert")
        .when(F.col("__new").isNull(), "delete")
        .when(changed, "update")
    )
    return (
        j.withColumn("change_type", ct)
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )
