"""Pandas-UDF escape hatch — SURVEY.md §2.10.

The reference needs zero UDFs for parity (its only row-wise callables
are pandas display code, expressible as when-chains). The engine
still ships the standard escape hatch because the north-star
operators want it: Arrow-batched ``pandas_udf`` for vectorized
scalar work and ``applyInPandas`` for per-group frames. Row-at-a-time
``F.udf`` is deliberately NOT wrapped — it is the slow path.

The examples here compute ORDER-EXACT results (running max, string
normalization) so they can be oracle-checked: pandas aggregation of
floats (numpy pairwise sums) does NOT bit-match SQL engines and
must not be used where cross-engine parity matters.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def grouped_running_max(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key running maximum via applyInPandas (grouped-map):
    each group arrives as one pandas frame, sorted locally, cummax'd.

    Comparison-only (no float accumulation) → exact across engines.
    Equivalent to a rows-unbounded-preceding window MAX — the window
    form is preferred in production (stays JVM-side); this exists to
    exercise and test the grouped-map path.
    """
    schema = (
        f"{key_col} long, {tiebreak_col} long, {value_col} double, "
        "running_max double"
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, tiebreak_col])
        out = pdf[[key_col, tiebreak_col, value_col]].copy()
        out["running_max"] = pdf[value_col].cummax()
        return out

    return df.select(key_col, ts_col, tiebreak_col, value_col).groupBy(
        key_col
    ).applyInPandas(per_group, schema=schema)


@F.pandas_udf(StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: trim + lowercase + collapse
    whitespace (Arrow batches, ~10-100x over row-at-a-time)."""
    return s.str.strip().str.lower().str.replace(r"\s+", " ", regex=True)


def word_ngrams_udtf():
    """Python UDTF (Spark 4 table function) — the one §2.10 surface
    beyond pandas_udf / applyInPandas / mapInPandas: a class-based
    table function usable under ``LATERAL`` in SQL. Yields
    (pos, ngram) word n-grams per input row.

    Returned lazily (a factory) so importing this module never pays
    the decorator cost when the UDTF is unused. Registered by the
    corpus entry as ``word_ngrams``; the DuckDB oracle replays it
    with unnest(range(...)) — the UDTF must therefore stay a pure
    function of its arguments. Scale note: UDTF rows cross the
    Python boundary row-at-a-time semantics-wise but are
    Arrow-batched in transport (useArrow); the built-in HOF
    transform/explode form (f_explode_tokens, x2 shingles) remains
    the hot path — this entry certifies the API surface, the same
    role s14 plays for the Python data source."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos INT, ngram STRING", useArrow=True)
    class WordNgrams:
        def eval(self, text: str, n: int):
            if text is None or n is None or n <= 0:
                return
            words = text.split(" ")
            for i in range(len(words) - n + 1):
                yield i + 1, " ".join(words[i : i + n])

    return WordNgrams
