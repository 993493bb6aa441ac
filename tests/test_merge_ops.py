"""MERGE/upsert and SCD2 operator semantics (operators/merge.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from eco_pulse_lakehouse_spark.operators.merge import scd2_apply, upsert


def test_upsert_updates_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "old"), (2, "keep")], "k INT, v STRING"
    )
    updates = spark.createDataFrame(
        [(1, "new"), (3, "ins")], "k INT, v STRING"
    )
    out = {r.k: r.v for r in upsert(target, updates, ["k"]).collect()}
    assert out == {1: "new", 2: "keep", 3: "ins"}


def test_scd2_closes_and_appends(spark):
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    current = spark.createDataFrame(
        [(1, "v1", t0, None), (2, "v1", t0, None)],
        "k INT, attr STRING, valid_from TIMESTAMP, valid_to TIMESTAMP",
    )
    changes = spark.createDataFrame(
        [(1, "v2", t1)], "k INT, attr STRING, changed_at TIMESTAMP"
    )
    out = scd2_apply(current, changes, ["k"], "changed_at").collect()
    rows = sorted(
        ((r.k, r.attr, r.valid_from, r.valid_to) for r in out)
    )
    assert rows == [
        (1, "v1", t0, t1),      # closed out by the change
        (1, "v2", t1, None),    # new open version
        (2, "v1", t0, None),    # untouched key stays open
    ]


def test_scd2_chains_multiple_changes_per_key(spark):
    """Several changes for one key in ONE batch must chain: each
    version closed by the next one's valid_from, only the latest
    open, history linear (the multi-change batch case)."""
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 3, 1)
    t2 = dt.datetime(2024, 6, 1)
    t3 = dt.datetime(2024, 9, 1)
    current = spark.createDataFrame(
        [(1, "v1", t0, None)],
        "k INT, attr STRING, valid_from TIMESTAMP, valid_to TIMESTAMP",
    )
    changes = spark.createDataFrame(
        [(1, "v3", t2), (1, "v2", t1), (1, "v4", t3)],  # out of order
        "k INT, attr STRING, changed_at TIMESTAMP",
    )
    out = scd2_apply(current, changes, ["k"], "changed_at").collect()
    rows = sorted((r.attr, r.valid_from, r.valid_to) for r in out)
    assert rows == [
        ("v1", t0, t1),
        ("v2", t1, t2),
        ("v3", t2, t3),
        ("v4", t3, None),  # exactly one open row
    ]
    open_rows = [r for r in out if r.valid_to is None]
    assert len(open_rows) == 1 and open_rows[0].attr == "v4"


def test_snapshot_diff_null_safety(spark):
    """NULL compare values neither mask changes nor fake inserts:
    NULL->value and value->NULL are updates; NULL->NULL is unchanged."""
    from eco_pulse_lakehouse_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, None), (4, 1.0)],
        "k BIGINT, v DOUBLE",
    )
    new = spark.createDataFrame(
        [(1, 7.0), (2, None), (3, None), (5, 9.0)],
        "k BIGINT, v DOUBLE",
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {1: "update", 2: "update", 4: "delete", 5: "insert"}


def test_asof_join_carries_whole_rows_not_stitched_columns(spark):
    """A matched right row's NULL field must stay NULL — per-column
    ignorenulls carries would back-fill it from an OLDER row, which
    DuckDB/pandas ASOF (row-wise match) never do."""
    from eco_pulse_lakehouse_spark.operators.joins import (
        asof_join,
        asof_join_tolerance,
    )

    left = spark.createDataFrame(
        [(1, 1000.0)], "k INT, lts DOUBLE"
    )
    right = spark.createDataFrame(
        [(1, 100.0, 5.0), (1, 900.0, None)],
        "k INT, rts DOUBLE, val DOUBLE",
    )
    got = asof_join(
        left, right, "k", "lts", "rts", ["val", "rts"]
    ).collect()[0]
    assert got.rts == 900.0 and got.val is None  # the MATCHED row's NULL
    # tolerance judges the same row the values came from: gap=100 ok,
    # so rts survives (and val stays the matched row's NULL)
    tol = asof_join_tolerance(
        left, right, "k", "lts", "rts", ["val"], tolerance_seconds=200.0
    ).collect()[0]
    assert tol.rts == 900.0 and tol.val is None
    # a tolerance tighter than the match gap NULLs everything
    tight = asof_join_tolerance(
        left, right, "k", "lts", "rts", ["val"], tolerance_seconds=50.0
    ).collect()[0]
    assert tight.rts is None and tight.val is None


def test_asof_family_matches_pandas_merge_asof(spark):
    """asof_join (both directions) and asof_join_tolerance must agree
    row-for-row with pandas.merge_asof — the canonical reference —
    on randomized keyed frames with NULL payload fields and
    duplicate timestamps across keys (seeded, deterministic)."""
    import random

    import pandas as pd

    from eco_pulse_lakehouse_spark.operators.joins import (
        asof_join,
        asof_join_tolerance,
    )

    rng = random.Random(421)
    left_rows = [
        (k, float(rng.randrange(0, 500)), i)
        for i, k in enumerate(rng.choices([1, 2, 3, 4], k=60))
    ]
    right_rows = [
        (
            k,
            float(rng.randrange(0, 500)),
            None if rng.random() < 0.3 else float(rng.randrange(100)),
        )
        for k in rng.choices([1, 2, 3, 4, 5], k=80)
    ]
    # pandas merge_asof requires unique, sorted 'on' values per merge;
    # de-dup (k, ts) on the right to keep the reference well-defined
    seen = set()
    right_rows = [
        r for r in right_rows if (r[0], r[1]) not in seen
        and not seen.add((r[0], r[1]))
    ]
    left = spark.createDataFrame(left_rows, "k INT, lts DOUBLE, lid INT")
    right = spark.createDataFrame(right_rows, "k INT, rts DOUBLE, val DOUBLE")
    lpdf = pd.DataFrame(left_rows, columns=["k", "lts", "lid"])
    rpdf = pd.DataFrame(right_rows, columns=["k", "rts", "val"])

    for direction in ("backward", "forward"):
        ref = pd.merge_asof(
            lpdf.sort_values("lts", kind="mergesort"),
            rpdf.sort_values("rts", kind="mergesort"),
            left_on="lts", right_on="rts", by="k",
            direction=direction,
        )
        got = asof_join(
            left, right, "k", "lts", "rts", ["val", "rts"],
            direction=direction,
        ).collect()
        ref_map = {
            int(r.lid): (
                None if pd.isna(r.rts) else r.rts,
                None if pd.isna(r.val) else r.val,
            )
            for r in ref.itertuples()
        }
        for r in got:
            assert (r.rts, r.val) == ref_map[r.lid], (direction, r)

    tol = 50.0
    ref = pd.merge_asof(
        lpdf.sort_values("lts", kind="mergesort"),
        rpdf.sort_values("rts", kind="mergesort"),
        left_on="lts", right_on="rts", by="k",
        direction="backward", tolerance=tol,
    )
    got = asof_join_tolerance(
        left, right, "k", "lts", "rts", ["val"], tolerance_seconds=tol
    ).collect()
    ref_map = {
        int(r.lid): (
            None if pd.isna(r.rts) else r.rts,
            None if pd.isna(r.val) else r.val,
        )
        for r in ref.itertuples()
    }
    for r in got:
        assert (r.rts, r.val) == ref_map[r.lid], r

    # forward tolerance exercises the gap sign-flip branch
    ref_f = pd.merge_asof(
        lpdf.sort_values("lts", kind="mergesort"),
        rpdf.sort_values("rts", kind="mergesort"),
        left_on="lts", right_on="rts", by="k",
        direction="forward", tolerance=tol,
    )
    got_f = asof_join_tolerance(
        left, right, "k", "lts", "rts", ["val"],
        tolerance_seconds=tol, direction="forward",
    ).collect()
    ref_map_f = {
        int(r.lid): (
            None if pd.isna(r.rts) else r.rts,
            None if pd.isna(r.val) else r.val,
        )
        for r in ref_f.itertuples()
    }
    for r in got_f:
        assert (r.rts, r.val) == ref_map_f[r.lid], r
