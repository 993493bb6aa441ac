"""MATCH_RECOGNIZE-style quantified event-sequence patterns.

The reference has no sequence-pattern surface at all; w13 covers
ordered-run counting over whole user histories. This module completes
the funnel family with PROPER quantified patterns (``A B+ C``) under
``WITHIN``-gap semantics: the match must lie inside one session
(gap-bounded run), rows must be CONTIGUOUS (as in SQL MATCH_RECOGNIZE
``PATTERN (A B+ C)``), the quantifier is greedy, and matches are
non-overlapping leftmost (``AFTER MATCH SKIP PAST LAST ROW``).

Spark-first shape — no UDF, no state machine:
  1. classify each event to ONE char (caller expression; the journey
     alphabet);
  2. sessionize with the w7 substrate (per-key lag-gap flag + running
     sum — exact integer arithmetic);
  3. fold each session into a journey STRING (collect_list of
     (ts, tiebreak, char) structs + array_sort → deterministic order
     with no extra sort pass);
  4. run the pattern as a REGEX over the journey — contiguity,
     greediness, and non-overlap are exactly the regex scan's
     semantics, evaluated per-row in the JVM.

Both the sessionize window and the (key, session) groupBy cluster on
the key, so the whole pipeline is ONE exchange (subset clustering —
the same property time_weighted_avg exploits). At 100 TB journey
length is bounded by events-per-session (the gap bounds it in time);
the alphabet keeps the string one byte per event.

The DuckDB oracle replays the identical construction (lag/cumsum
sessionize, ordered string_agg, regexp_extract_all) — the regex
engines (java.util.regex vs RE2) agree on leftmost non-overlapping
greedy scans for these patterns, a pairing w13 already certifies.

GAP PRECISION (round-5 review finding, confirmed at sf0.1): the gap
test compares TRUNCATED epoch seconds (``ts.cast("long")`` — the w8
convention), so the oracle must diff floor(epoch(ts)) too; a naive
``ts - lag(ts) <= INTERVAL`` compares at microsecond precision and
disagrees on gaps inside (gap, gap+1s) — sf0.1 has such a boundary
pair, the certified smaller sfs happen not to. Ordering stays
full-precision (ts, tiebreak) in both engines; only the gap diff is
second-granular.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _session_journeys(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    class_char: Column,
    gap_seconds: int,
) -> DataFrame:
    """Shared substrate: (key, session_id, journey) — w7 lag/cumsum
    sessionize + order-insensitive journey fold, ONE exchange."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    gap_ok = (
        F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    ) <= gap_seconds
    flagged = events.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(tiebreak_col),
        class_char.alias("__c"),
        F.when(gap_ok, 0).otherwise(1).alias("__is_new"),
    )
    with_session = flagged.withColumn(
        "session_id",
        F.sum("__is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    journey = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(ts_col, tiebreak_col, F.col("__c").alias("c"))
                )
            ),
            lambda s: s.getField("c"),
        ),
        "",
    )
    return with_session.groupBy(key_col, "session_id").agg(
        journey.alias("journey")
    )


def _matched_chars(pattern: Column) -> Column:
    return F.aggregate(
        F.regexp_extract_all(F.col("journey"), pattern, F.lit(0)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.length(x),
    )


def sessionized_pattern_matches(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    class_char: Column,
    pattern: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Count quantified-pattern matches per (key, session).

    ``class_char`` maps each row to one character of the pattern
    alphabet; ``pattern`` is a regex over that alphabet (e.g.
    ``s[cv]+p`` = signup, one-or-more click/view, purchase — an
    intervening 'e' breaks contiguity exactly as MATCH_RECOGNIZE
    would). Returns (key, session_id, journey, n_matches,
    first_match_pos, matched_chars); first_match_pos is 1-based,
    0 when no match.
    """
    pat = F.lit(pattern)
    return _session_journeys(
        events, key_col, ts_col, tiebreak_col, class_char, gap_seconds
    ).select(
        key_col,
        "session_id",
        "journey",
        F.regexp_count(F.col("journey"), pat)
        .cast("bigint")
        .alias("n_matches"),
        F.regexp_instr(F.col("journey"), pat)
        .cast("bigint")
        .alias("first_match_pos"),
        _matched_chars(pat).alias("matched_chars"),
    )


def sessionized_multi_pattern_matches(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    class_char: Column,
    patterns: dict[str, str],
    gap_seconds: int = 1800,
) -> DataFrame:
    """Several MATCH_RECOGNIZE patterns over ONE session/journey pass
    — the full quantifier surface in one plan: alternation groups
    (``A (B|C)+ D`` as ``s(?:cv|vc)+p`` — sequence alternation, not a
    character class), RELUCTANT quantifiers (``B+?`` — leftmost-first
    shortest expansion, the ``AFTER MATCH`` contrast to greedy), and
    their greedy twins, each as ``n_<name>`` / ``chars_<name>``
    columns. Matching stays a per-row JVM regex scan over the journey
    string, so adding patterns adds projections, not exchanges.

    java.util.regex (backtracking) and DuckDB's RE2 agree on
    leftmost-first non-overlapping scans INCLUDING non-greedy ``+?``
    and non-capturing alternation (verified case-by-case in round 5:
    e.g. ``s[cvp]+?p`` on ``scpvp`` -> ``scp`` in both engines while
    greedy takes the whole string), so the oracle replays the same
    regexes with regexp_extract_all."""
    jd = _session_journeys(
        events, key_col, ts_col, tiebreak_col, class_char, gap_seconds
    )
    cols = [F.col(key_col), F.col("session_id"), F.col("journey")]
    for name, pattern in patterns.items():
        pat = F.lit(pattern)
        cols.append(
            F.regexp_count(F.col("journey"), pat)
            .cast("bigint")
            .alias(f"n_{name}")
        )
        cols.append(_matched_chars(pat).alias(f"chars_{name}"))
    return jd.select(*cols)
